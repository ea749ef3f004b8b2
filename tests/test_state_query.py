"""Sequencer state-query API — the reference graph manager's public
interface (ref include/mimosa/graph/manager.hpp:120-148: getCurrentState,
getStateUpto, getPoseAt, getCurrentOptimizedValues)."""

import numpy as np

from mimosa_tpu.io import synthetic as syn


def build_seq():
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    lm = syn.LidarModel()
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=lm.n_rows * lm.n_cols, n_geo_points=4096,
            n_map_points=8192, geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2),
        win_cfg=win.WindowConfig(K=5),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(loc_count_thresh=50.0),
        dtype=jnp.float32), lm


def run_short():
    s, lm = build_seq()
    world = syn.room_world()
    data = syn.generate(world, syn.TrajectoryConfig(t_total=3.0), lm, seed=0)
    ii = 0
    imu = data["imu"]
    for scan in data["scans"]:
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    return s, data


def test_log_ring_growth():
    """Runs longer than max_trajectory must grow the device rings instead
    of silently clamping scatters onto the scratch row."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    lm = syn.LidarModel()
    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=lm.n_rows * lm.n_cols, n_geo_points=4096,
            n_map_points=8192, geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2, max_trajectory=8),
        win_cfg=win.WindowConfig(K=5),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(loc_count_thresh=50.0),
        dtype=jnp.float32)
    world = syn.room_world()
    data = syn.generate(world, syn.TrajectoryConfig(t_total=3.0), lm, seed=1)
    ii = 0
    imu = data["imu"]
    for scan in data["scans"]:
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    assert len(s._traj_ts) >= 12        # outgrew the initial capacity twice
    assert s.traj_q.shape[0] >= len(s._traj_ts) + 1
    traj = s.trajectory                  # would IndexError pre-fix
    assert len(traj) == len(s._traj_ts)
    assert s.debug_records().shape[0] == s.scan_idx
    # rows stay distinct (no clamp-to-scratch pileup): the pose keeps
    # moving after the ring crossed its initial capacity
    p = np.asarray([pp for _, pp, _ in traj])
    assert np.linalg.norm(p[-1] - p[len(p) // 2]) > 1e-3
    assert np.linalg.norm(p[-1] - p[8]) > 1e-3
    gt = data["gt"]
    ts_all = np.asarray([t for t, _, _ in traj])
    assert syn.ate_rmse(ts_all, p, gt["ts"], gt["pos"]) < 0.05


def test_pre_init_queries_are_empty():
    s, _ = build_seq()
    assert s.current_state() is None
    assert s.optimized_values() == []
    assert s.state_upto(1.0) is None
    assert s.pose_at(1.0) is None


def test_current_state_matches_trajectory_and_gt():
    s, data = run_short()
    st = s.current_state()
    assert st is not None
    assert st.ts == s.state_ts[-1]
    np.testing.assert_allclose(np.linalg.norm(st.q), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(st.g_dir), 1.0, atol=1e-5)
    # newest trajectory row is this state's pose
    ts_t, p_t, q_t = s.trajectory[-1]
    assert ts_t == st.ts
    np.testing.assert_allclose(st.p, p_t, atol=1e-6)
    np.testing.assert_allclose(st.q, q_t, atol=1e-6)
    # tracks ground truth (aligned — the estimator's world frame is the
    # initial body frame, not the synthetic world's)
    gt = data["gt"]
    ts_all = np.asarray([t for t, _, _ in s.trajectory])
    p_all = np.asarray([pp for _, pp, _ in s.trajectory])
    assert syn.ate_rmse(ts_all, p_all, gt["ts"], gt["pos"]) < 0.05


def test_optimized_values_cover_live_window():
    s, _ = run_short()
    vals = s.optimized_values()
    assert len(vals) == s.n_active
    ts = [v.ts for v in vals]
    assert ts == sorted(ts) and ts == s.state_ts[: s.n_active]
    cur = s.current_state()
    np.testing.assert_allclose(vals[-1].p, cur.p, atol=0)
    np.testing.assert_allclose(vals[-1].v, cur.v, atol=0)
    np.testing.assert_allclose(vals[-1].bg, cur.bg, atol=0)


def test_state_upto_picks_rightmost_not_newer():
    s, _ = run_short()
    assert s.n_active >= 3
    # just after the 2nd live state -> that state
    st = s.state_upto(s.state_ts[1] + 1e-6)
    assert st.ts == s.state_ts[1]
    # exactly at a state ts -> that state (<= semantics)
    st = s.state_upto(s.state_ts[2])
    assert st.ts == s.state_ts[2]
    # within the reference's 4 ms grace below the oldest live state ->
    # the oldest state (ref graph/manager.cpp:532-541 fallback)
    st = s.state_upto(s.state_ts[0] - 1e-6)
    assert st is not None and st.ts == s.state_ts[0]
    # beyond the grace -> None (marginalized out)
    assert s.state_upto(s.state_ts[0] - 5e-3) is None


def test_pose_at_full_log_and_interpolation():
    s, _ = run_short()
    traj = s.trajectory
    assert len(traj) > s.n_active  # log outlives the window
    ts0, p0, q0 = traj[0]          # a marginalized state
    got = s.pose_at(ts0)
    assert got is not None
    q_got, p_got = got
    np.testing.assert_allclose(p_got, p0, atol=1e-6)
    np.testing.assert_allclose(q_got, q0, atol=1e-6)
    # out of tolerance -> None
    assert s.pose_at(traj[-1][0] + 10.0) is None
    assert s.pose_at(ts0 - 1.0, interpolate=True) is None
    # interpolated midpoint lies between its brackets
    (ts_a, p_a, _), (ts_b, p_b, _) = traj[3], traj[4]
    mid = 0.5 * (ts_a + ts_b)
    q_m, p_m = s.pose_at(mid, interpolate=True)
    np.testing.assert_allclose(p_m, 0.5 * (p_a + p_b), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(q_m), 1.0, atol=1e-5)
    lo = np.minimum(p_a, p_b) - 1e-5
    hi = np.maximum(p_a, p_b) + 1e-5
    assert np.all(p_m >= lo) and np.all(p_m <= hi)
