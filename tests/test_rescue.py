"""Tracking-loss rescue (SequencerConfig.rescue_enabled): the multi-start
re-registration must recover from an estimator-state kick that loses the
correspondence basin, and must stay inert on clean runs."""

import numpy as np
import jax.numpy as jnp
import pytest

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh

LEAF = 0.4


def _make_sequencer(n_scan_pts, rescue):
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=max(4096, n_scan_pts),
            n_geo_points=4096, n_map_points=8192,
            geo_leaf=LEAF, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=3, rescue_enabled=rescue, rescue_radius=1.0,
        ),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=LEAF, capacity_log2=17,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def data():
    world = syn.room_world()
    d = syn.generate(world, syn.TrajectoryConfig(t_total=8.0),
                     syn.LidarModel(), seed=1)
    d["n_scan_pts"] = syn.LidarModel().n_rows * syn.LidarModel().n_cols
    return d


def _replay(data, rescue, kick_at=None):
    s = _make_sequencer(data["n_scan_pts"], rescue)
    imu, imu_i = data["imu"], 0
    for j, scan in enumerate(data["scans"]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while imu_i < len(imu["ts"]) and imu["ts"][imu_i] <= t_end + 0.03:
            s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                      imu["gyro"][imu_i])
            imu_i += 1
        if kick_at is not None and j == kick_at and s.n_active > 0:
            # believed-drift fault injection: shift the WHOLE window —
            # values AND linearization points, so the prior carries no
            # restoring force — by ~2.5 map leaves. The map disagrees with
            # everything the estimator believes; only a correct
            # re-association can recover (the knife-edge regime where
            # fresh per-point rematching provably fails, see
            # SequencerConfig.rematch_on_motion docstring)
            dp = jnp.asarray([0.85, 0.5, 0.0], jnp.float32)
            s.window = s.window._replace(
                p=s.window.p + dp, lin_p=s.window.lin_p + dp)
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    est_t = np.array([t for t, _, _ in s.trajectory])
    est_p = np.array([p for _, p, _ in s.trajectory])
    ate = syn.ate_rmse(est_t, est_p, data["gt"]["ts"], data["gt"]["pos"])
    return s, ate


def test_rescue_recovers_from_state_kick(data):
    kick = 30
    s, _ = _replay(data, rescue=True, kick_at=kick)
    rec = s.debug_records()
    n_rescues = int(rec[:, 16].sum())
    assert n_rescues >= 1, "kick did not trigger the rescue"
    # the states logged while the window still held kicked neighbors are
    # transitional; the gate is that tracking RE-CONVERGES: ATE over the
    # trajectory excluding the transition must return to clean levels
    est = [(t, p) for i, (t, p, _) in enumerate(s.trajectory)
           if not kick <= i < kick + 8]
    est_t = np.array([t for t, _ in est])
    est_p = np.array([p for _, p in est])
    ate_tail = syn.ate_rmse(est_t, est_p, data["gt"]["ts"],
                            data["gt"]["pos"])
    assert ate_tail < 0.10, \
        f"rescue failed to recover tracking: ATE {ate_tail:.3f} m"


def test_rescue_inert_on_clean_run(data):
    """On a clean run the rescue must never trigger, and the trajectory
    must match the non-rescue program (the lax.cond false branch is a
    passthrough)."""
    s_on, ate_on = _replay(data, rescue=True)
    s_off, ate_off = _replay(data, rescue=False)
    assert int(s_on.debug_records()[:, 16].sum()) == 0
    p_on = np.array([p for _, p, _ in s_on.trajectory])
    p_off = np.array([p for _, p, _ in s_off.trajectory])
    np.testing.assert_allclose(p_on, p_off, atol=1e-5)
    assert ate_on < 0.10 and ate_off < 0.10
