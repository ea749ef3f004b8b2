"""Default-tier flagship smoke: every headline behavior at tiny cost.

The two-tier split (r4) moved all flagship e2e gates — corridor
degeneracy, multimodal fusion, photometric, bulk equivalence — into the
heavy tier that only runs at round end, so a radar/odom/photo/bulk
regression could land unnoticed between rounds (VERDICT r4 weak #3).
This module is the per-commit guard: scaled-down (16x256, 3.5-4 s)
replays of each flagship behavior sharing ONE geometric config (one
compiled program set via a module step_cache), with gates set at
sanity scale — runaway/death detection, not fine accuracy (CLAUDE.md:
never gate fine accuracy on marginal shapes; the heavy tier owns the
precise gates).

Reference analogue: the replay-as-integration-test philosophy of
/root/reference/mimosa/src/mimosa_rosbag.cpp:49-247.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh

_STEP_CACHE = {}
_LM = syn.LidarModel()          # 16x256 default


def _make_sequencer(photo=False, project_degenerate=False):
    photo_cfg = None
    if photo:
        from mimosa_tpu.lidar import photometric as ph
        photo_cfg = ph.PhotometricConfig(
            rows=_LM.n_rows, cols=_LM.n_cols, fov_up=_LM.fov_up,
            fov_down=_LM.fov_down, range_min=0.5, range_max=40.0,
            gradient_threshold=2.0, nma_radius=5, num_features=48,
            margin=3, intensity_scale=1.0, filter_brightness=False,
            remove_lines=False, project_on_degeneracy=True)
    return seq.Sequencer(
        photo_cfg=photo_cfg,
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=2048, n_map_points=4096,
            geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2),
        win_cfg=win.WindowConfig(K=4),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(
            project_degenerate=project_degenerate),
        dtype=jnp.float32, step_cache=_STEP_CACHE)


def _stream_scans(s, data, extra=()):
    """Streaming replay in dispatch order (scans + optional radar/odom
    events), IMU fed ahead of each event."""
    items = [(seq.Sequencer._scan_t_end(sc), 0, sc)
             for sc in data["scans"]]
    items += [(float(m["ts"]), c, m) for c, m in extra]
    items.sort(key=lambda e: (e[0], e[1]))
    imu, imu_i = data["imu"], 0
    for t, code, m in items:
        j = int(np.searchsorted(imu["ts"], t + 0.03, "right"))
        if j > imu_i:
            s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                            imu["gyro"][imu_i:j])
            imu_i = j
        if code == 0:
            s.add_scan(m["ts_header"], m["points"], m["t_rel"],
                       m.get("valid"), intensity=m.get("intensity"))
        elif code == 1:
            s.add_radar(m["ts"], m["points_r"], m["doppler"],
                        m.get("snr_db"))
        else:
            s.add_odometry(m["ts"], m["q"], m["p"], m.get("cov6"))
    return s


def _ate(s, data):
    ts = np.asarray([t for t, _, _ in s.trajectory])
    p = np.asarray([p for _, p, _ in s.trajectory])
    return float(syn.ate_rmse(ts, p, data["gt"]["ts"],
                              data["gt"]["pos"]))


@pytest.fixture(scope="module")
def room():
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=3.5)
    data = syn.generate(world, tc, _LM, seed=0, imu_noise=0.005,
                        range_noise=0.01)
    return data, tc


def test_smoke_corridor_degeneracy():
    """Degeneracy projection keeps the corridor replay at honest-drift
    scale instead of the spurious-anchor runaway; the degenerate axis is
    flagged on most scans."""
    world = syn.corridor_world()
    tc = syn.TrajectoryConfig(t_total=4.0, amp=(4.0, 0.6, 0.3),
                              center=(40.0, 2.0, 1.5), yaw_rate=0.15)
    data = syn.generate(world, tc, _LM, seed=0, imu_noise=0.01,
                        range_noise=0.005)
    s = _stream_scans(_make_sequencer(project_degenerate=True), data)
    rec = s.debug_records()
    assert rec[3:, 9:12].max(-1).mean() > 0.7, "degeneracy not detected"
    assert _ate(s, data) < 8.0, "corridor runaway despite projection"


def test_smoke_multimodal(room):
    """LiDAR + radar + odometry streaming fusion stays sane and every
    modality's factors actually enter (counters)."""
    data, tc = room
    traj = syn.make_trajectory(tc)
    radar = syn.generate_radar(traj, tc, rate=11.0, n_targets=32, seed=0)
    odom = syn.generate_odometry(traj, tc, rate=4.0, seed=0)
    extra = [(1, dict(ts=fr["ts"], points_r=fr["points"],
                      doppler=fr["doppler"], snr_db=fr["snr_db"]))
             for fr in radar]
    extra += [(2, dict(ts=m["ts"], q=m["q"], p=m["t"], cov6=m["cov"]))
              for m in odom]
    s = _stream_scans(_make_sequencer(), data, extra=extra)
    assert s.counters["radar_frames"] > 10
    assert s.counters["odom_msgs"] > 5
    assert _ate(s, data) < 0.3


def test_smoke_bulk_equivalence(room):
    """add_scans_bulk == streaming at the non-chaotic shape (pointwise,
    the per-commit guard for the bulk scheduler; the strict tier and
    fuzz own the deep coverage)."""
    data, _ = room
    s0 = _stream_scans(_make_sequencer(), data)
    s1 = _make_sequencer()
    imu = data["imu"]
    s1.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
    s1.add_scans_bulk(data["scans"], chunk=6)
    assert s1.timers.counts.get("t_bulk_pack", 0) > 0, "no chunk ran"
    assert s0.state_ts == s1.state_ts
    t0, t1 = s0.trajectory, s1.trajectory
    assert len(t0) == len(t1)
    for (_, p0, _), (_, p1, _) in zip(t0, t1):
        np.testing.assert_allclose(p0, p1, atol=5e-3)


def test_smoke_photometric(room):
    """The PG-LIO pipeline (geo + photometric) tracks features and does
    not degrade the solution on a textured room."""
    data, _ = room
    s = _stream_scans(_make_sequencer(photo=True), data)
    rec = s.debug_records()
    assert int(np.median(rec[3:, 12])) > 5, "photometric tracking died"
    assert _ate(s, data) < 0.3
