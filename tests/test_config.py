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
