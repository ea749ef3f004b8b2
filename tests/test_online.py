"""Online driver (io/online.py): equivalence with offline replay, the
high-rate propagation output, and backpressure."""

import numpy as np
import jax.numpy as jnp
import pytest

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.io.online import OnlineEstimator
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


def _make_sequencer(n_scan_pts):
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=max(4096, n_scan_pts),
            n_geo_points=4096, n_map_points=8192,
            geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2,
        ),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=17,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def data():
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=6.0)
    lm = syn.LidarModel()
    d = syn.generate(world, tc, lm, seed=0)
    d["n_scan_pts"] = lm.n_rows * lm.n_cols
    return d


def _run_offline(data):
    s = _make_sequencer(data["n_scan_pts"])
    imu, imu_i = data["imu"], 0
    for scan in data["scans"]:
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while imu_i < len(imu["ts"]) and imu["ts"][imu_i] <= t_end + 0.03:
            s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                      imu["gyro"][imu_i])
            imu_i += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    return s


def test_online_matches_offline(data):
    """Pushing the identical event stream through the threaded online
    driver must produce the same trajectory as the offline loop — the
    worker's collection-delay holdback replicates the offline ordering."""
    offline = _run_offline(data)

    prop_out = []
    states = []
    est = OnlineEstimator(
        _make_sequencer(data["n_scan_pts"]),
        on_propagated=lambda ts, q, p, v: prop_out.append((ts, p)),
        on_state=lambda ts, q, p, v, bg, ba, g: states.append((ts, p)),
        collection_slack=0.03,
        # events are pushed without real-time pacing; first-compile would
        # overflow a realistic backlog bound, and this test must not drop
        max_pending_scans=10_000)
    # true arrival order: each scan arrives at its header time, IMU at its
    # own rate — the holdback queue must reorder processing
    events = [("imu", t, i) for i, t in enumerate(data["imu"]["ts"])]
    events += [("scan", sc["ts_header"], sc) for sc in data["scans"]]
    events.sort(key=lambda e: e[1])
    # pace by letting the worker catch up at every scan (stand-in for
    # real-time arrival): the propagator's catch-up replay needs the base
    # state to stay within its history ring, as it does live
    for kind, _, x in events:
        if kind == "imu":
            est.push_imu(data["imu"]["ts"][x], data["imu"]["acc"][x],
                         data["imu"]["gyro"][x])
        else:
            assert est.push_scan(x["ts_header"], x["points"], x["t_rel"],
                                 x["valid"])
            assert est.flush(timeout=120.0)
    # thread-safe query surface (ref getCurrentState + the IMU-rate path)
    cs = est.current_state()
    assert cs is not None and cs.ts <= est.seq.last_state_ts
    cp = est.current_pose()
    assert cp is not None and cp[0] >= cs.ts
    est.stop(drain=True)

    assert est.counters["scans_dropped_backlog"] == 0
    # after drain the snapshot reflects the newest optimized state
    cs = est.current_state()
    assert cs is not None
    np.testing.assert_allclose(
        cs.p, est.seq.current_state().p, atol=1e-6)
    t_off = np.array([t for t, _, _ in offline.trajectory])
    p_off = np.array([p for _, p, _ in offline.trajectory])
    t_on = np.array([t for t, _, _ in est.seq.trajectory])
    p_on = np.array([p for _, p, _ in est.seq.trajectory])
    # identical event order + identical jitted programs => same result
    np.testing.assert_allclose(t_on, t_off, atol=0)
    np.testing.assert_allclose(p_on, p_off, atol=1e-6)

    # graph-rate output fired and the high-rate path produced poses close
    # to ground truth (propagation from the last optimized state)
    assert est.counters["rebases"] > 0
    assert len(states) > 0
    assert len(prop_out) > 0.25 * len(data["imu"]["ts"])
    # high-rate path consistent with the graph-rate path (both live in the
    # estimator's world frame; GT lives in its own frame, so compare
    # against the optimized trajectory, not GT)
    traj_t = np.array([t for t, _, _ in est.seq.trajectory])
    traj_p = np.array([p for _, p, _ in est.seq.trajectory])
    errs = []
    for ts, p in prop_out:
        gi = np.searchsorted(traj_t, ts)
        if 0 < gi < len(traj_t) and traj_t[gi] - traj_t[gi - 1] < 0.5:
            a = (ts - traj_t[gi - 1]) / (traj_t[gi] - traj_t[gi - 1])
            p_ref = (1 - a) * traj_p[gi - 1] + a * traj_p[gi]
            errs.append(np.linalg.norm(p - p_ref))
    assert len(errs) > 50
    assert np.median(errs) < 0.15


def test_online_backpressure_drops(data):
    est = OnlineEstimator(_make_sequencer(data["n_scan_pts"]),
                          max_pending_scans=0)
    sc = data["scans"][0]
    assert not est.push_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                             sc["valid"])
    assert est.counters["scans_dropped_backlog"] == 1
    est.stop(drain=False)


def test_online_worker_survives_bad_event(data):
    """A malformed message must not kill the worker thread (the reference
    logs and continues — logCriticalException)."""
    est = OnlineEstimator(_make_sequencer(data["n_scan_pts"]))
    est.push_odometry(1.0, np.zeros(3), np.zeros(4))  # swapped q/t shapes
    assert est.flush(timeout=30.0)
    assert est._worker.is_alive()
    est.stop(drain=True)


def test_online_worker_staging(data):
    """stage_on_push=False defers the pack + transfer to the worker
    thread (the tunneled-device mode); results must match push-staging."""
    est = OnlineEstimator(_make_sequencer(data["n_scan_pts"]),
                          collection_slack=0.03, max_pending_scans=10_000,
                          stage_on_push=False)
    imu, imu_i = data["imu"], 0
    for scan in data["scans"][:20]:
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while imu_i < len(imu["ts"]) and imu["ts"][imu_i] <= t_end + 0.03:
            est.push_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                         imu["gyro"][imu_i])
            imu_i += 1
        assert est.push_scan(scan["ts_header"], scan["points"],
                             scan["t_rel"], scan["valid"])
    est.stop(drain=True)
    assert est.seq.initialized
    assert len(est.seq.trajectory) > 5
    assert est.counters["rebases"] > 0
