"""Config loader: reference params.yaml -> framework dataclasses."""

import math

from mimosa_tpu.config import loader


REF_ENWIDE = "/root/reference/mimosa/config/enwide/params.yaml"
REF_HORNBILL = "/root/reference/mimosa/config/hornbill/params.yaml"


def test_load_enwide():
    cs = loader.load_reference_yaml(REF_ENWIDE)
    # lag 0.5 s @ 10 Hz declares -> K = 6
    assert cs.window.K == 6
    assert abs(cs.window.g_mag - 9.806) < 1e-6
    assert cs.voxel_map.leaf_size == 0.5
    assert cs.voxel_map.neighbor_voxel_mode == 19
    assert cs.voxel_map.lru_horizon == 1000
    assert abs(cs.geometric.sigma - 0.07) < 1e-9
    assert abs(cs.geometric.huber_delta - 1.345 * 0.07) < 1e-9
    assert not cs.geometric.use_4dof
    assert cs.sequencer.n_gn_iters == 6
    assert not cs.sequencer.gravity_aligned_init
    assert cs.lidar_enabled
    # T_B_S translation from the yaml
    assert abs(cs.sequencer.t_b_l[0] - (-0.006253)) < 1e-9


def test_load_hornbill_radar():
    cs = loader.load_reference_yaml(REF_HORNBILL)
    assert cs.radar_enabled
    assert abs(cs.radar.sigma - 0.037527767) < 1e-9
    assert cs.radar.min_snr_db == 5.0
    assert abs(cs.radar.max_azimuth - math.radians(60)) < 1e-9
    assert cs.radar.max_range == 16.0
    # radar extrinsics quaternion reordered to w-first from
    # [x y z qx qy qz qw] and normalized (gtsam::Rot3 semantics)
    assert abs(cs.radar.q_b_r[0] - 0.021) < 1e-3
    assert abs(cs.radar.q_b_r[1] - 0.963) < 1e-3
    assert abs(sum(x * x for x in cs.radar.q_b_r) - 1.0) < 1e-12


def test_override_overlay(tmp_path):
    ov = tmp_path / "override.yaml"
    ov.write_text(
        "lidar:\n  geometric:\n    scan_to_map:\n      reg_4_dof: true\n")
    cs = loader.load_reference_yaml(REF_ENWIDE, override_path=str(ov))
    assert cs.geometric.use_4dof


def test_seq_overrides():
    cs = loader.load_reference_yaml(REF_ENWIDE, max_scan_points=4096,
                                    n_geo_points=1024)
    assert cs.sequencer.max_scan_points == 4096
    assert cs.sequencer.n_geo_points == 1024


def test_plane_min_points_maps_num_corres_points():
    """ref geometric_config.hpp:23: planes are fit from num_corres_points
    kNN points (5 in every dataset config); the voxel-map plane validity
    threshold must follow it, not a stricter default."""
    from mimosa_tpu.config.loader import from_reference_dict
    cs = from_reference_dict({})
    assert cs.voxel_map.plane_min_points == 5
    cs = from_reference_dict(
        {"lidar": {"geometric": {"scan_to_map": {"num_corres_points": 7}}}})
    assert cs.voxel_map.plane_min_points == 7


def test_load_all_reference_platforms():
    """Every shipped platform config parses and the modality flags match
    the reference's dataset matrix (enwide/newer_college = LiDAR+IMU;
    hornbill/magpie/lapwing/parrot/euroc declare radar in the YAML —
    euroc's launch simply never remaps a radar topic)."""
    import os
    base = "/root/reference/mimosa/config"
    expect_radar = {"hornbill", "magpie", "lapwing", "parrot", "euroc"}
    for name in ["enwide", "newer_college", "hornbill", "magpie",
                 "lapwing", "parrot", "euroc"]:
        path = os.path.join(base, name, "params.yaml")
        cs = loader.load_reference_yaml(path)
        assert cs.window.K >= 2, name
        assert cs.sequencer.max_imu_per_segment > 0, name
        assert cs.radar_enabled == (name in expect_radar), name
        if name in expect_radar:
            assert cs.radar.sigma > 0, name
        # every config declares valid lidar extrinsics (unit quaternion)
        q = cs.sequencer.q_b_l
        assert abs(sum(x * x for x in q) - 1.0) < 1e-6, name


def test_enwide_new_keys():
    """Keys wired in the config-parity sweep load with the reference's
    exact names (degen_thresh_rot, use_robust_cost_function, FIR taps,
    imu manager scaling)."""
    cs = loader.load_reference_yaml(REF_ENWIDE)
    # enwide: degen_thresh_trans 40, degen_thresh_rot 0
    assert cs.geometric.loc_count_thresh == 40.0
    assert cs.geometric.loc_count_thresh_rot == 0.0
    assert cs.sequencer.imu_acc_scale == 1.0
    assert cs.sequencer.imu_max_buffer_duration > 0
    ph_cfg = loader.photometric_from_reference(cs.raw)
    # enwide: use_robust_cost_function false, huber param 1.345
    assert not ph_cfg.use_robust
    assert ph_cfg.robust == "huber"
    assert abs(ph_cfg.huber_delta - 1.345) < 1e-9
    assert ph_cfg.gaussian_blur_size == 3
    # the FIR taps come from the yaml, not the builtin defaults
    assert len(ph_cfg.hp_fir) == 33 and len(ph_cfg.lp_fir) == 33
    assert ph_cfg.grad_kernel == "central"


def test_hornbill_odometry_keys():
    """The reference's odometry keys are sigma_rot_deg / sigma_trans_m /
    d_opt_thresh (src/odometry/manager.cpp:82-84)."""
    cs = loader.load_reference_yaml(REF_HORNBILL)
    assert abs(cs.odometry.sigma_rot - math.radians(0.5)) < 1e-12
    assert abs(cs.odometry.sigma_trans - 0.001) < 1e-12
    assert abs(cs.odometry.max_d_optimality - 1.0) < 1e-12


def test_use_huber_toggle(tmp_path):
    ov = tmp_path / "override.yaml"
    ov.write_text(
        "lidar:\n  geometric:\n    scan_to_map:\n      use_huber: false\n")
    cs = loader.load_reference_yaml(REF_ENWIDE, override_path=str(ov))
    assert cs.geometric.huber_delta > 1e20  # disabled = never clamps
