"""Out-of-order state insertion (the reference's factor-breaking path,
graph/manager.cpp:267-417, re-designed as window insertion + segment
re-integration)."""

import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre

CFG = win.WindowConfig(K=5)


def make_window(n_states=3):
    w = win.create(CFG, jnp.float64)
    for i in range(n_states):
        q = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.1 * i]))
        p = jnp.asarray([float(i), 0.0, 0.0])
        w = win.append_state(w, q, p, jnp.zeros(3), jnp.zeros(3),
                             jnp.zeros(3), float(i))
    w = win.init_priors(w, CFG)
    return w


def test_insert_preserves_order():
    w = make_window(3)
    q_new = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.15]))
    p_new = jnp.asarray([1.5, 0.0, 0.0])
    w2 = win.insert_state_at(w, jnp.asarray(2), q_new, p_new, jnp.zeros(3),
                             jnp.zeros(3), jnp.zeros(3), 1.5, CFG)
    # slot 4 inherits the old (inactive, zeroed) slot 3
    np.testing.assert_allclose(w2.p[:, 0], [0.0, 1.0, 1.5, 2.0, 0.0],
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(w2.active),
                                  [True, True, True, True, False])
    np.testing.assert_allclose(w2.ts[:4], [0.0, 1.0, 1.5, 2.0], atol=0)


def test_insert_permutes_prior():
    w = make_window(3)
    # put a distinctive prior block on state 1's position dims
    idx = win.pose_idx(1)
    w = win.add_measurement_block(w, idx, jnp.eye(6) * 77.0,
                                  jnp.ones(6) * 3.0, CFG)
    w2 = win.insert_state_at(w, jnp.asarray(1), lie.quat_identity(jnp.float64),
                             jnp.asarray([0.5, 0, 0]), jnp.zeros(3),
                             jnp.zeros(3), jnp.zeros(3), 0.5, CFG)
    # the 77-block moved with its state (now slot 2)
    i2 = np.asarray(win.pose_idx(2))
    np.testing.assert_allclose(
        np.asarray(w2.H_prior)[np.ix_(i2, i2)][0, 0], 77.0)
    # inserted slot 1 has zero prior
    i1 = np.asarray(win.pose_idx(1))
    np.testing.assert_allclose(np.asarray(w2.H_prior)[np.ix_(i1, i1)], 0.0)
    np.testing.assert_allclose(np.asarray(w2.b_prior)[i1], 0.0)
    # slot 0's init prior stays put
    assert float(w2.H_prior[0, 0]) > 0


def test_insert_then_solve_consistent():
    """GN on the window after an insertion stays finite and respects the
    re-integrated IMU chain."""
    rng = np.random.default_rng(0)
    w = make_window(3)
    # fresh preint chain over the 4 states (after insertion)
    w2 = win.insert_state_at(w, jnp.asarray(1), lie.quat_identity(jnp.float64),
                             jnp.asarray([0.5, 0, 0]), jnp.zeros(3),
                             jnp.zeros(3), jnp.zeros(3), 0.5, CFG)
    segs = []
    for i in range(CFG.K - 1):
        accs = jnp.tile(jnp.asarray([[0.0, 0.0, 9.81]]), (20, 1))
        gyros = jnp.zeros((20, 3))
        segs.append(pre.preintegrate(accs, gyros, jnp.full(20, 0.01),
                                     jnp.zeros(3), jnp.zeros(3), 1e-3, 1e-5))
    preints = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segs)
    fv = jnp.asarray([True, True, True, False])
    H, rhs = win.build_system(w2, preints, fv, CFG)
    dx = win.solve(H, rhs)
    assert np.isfinite(np.asarray(dx)).all()
    w3 = win.apply_update(w2, dx, CFG)
    assert np.isfinite(np.asarray(w3.p)).all()


def test_sequencer_radar_ooo_insertion():
    """A radar frame older than the newest state must be inserted
    mid-window (or same-key collapsed), not dropped."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh
    from mimosa_tpu.radar import factor as rad

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)
    traj = syn.make_trajectory(tc)
    radar = syn.generate_radar(traj, tc, rate=20.0, seed=0)

    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=4096, n_map_points=8192,
            geo_leaf=0.4, map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
            keyframe_rot_thresh=0.15, n_gn_iters=2,
            max_measurement_latency=0.5),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32)
    s.radar_cfg = rad.RadarConfig()

    imu = data["imu"]
    ii = 0
    # feed scans IN ORDER, then inject radar frames that are OLDER than the
    # newest scan state (the real-world arrival pattern)
    for k, scan in enumerate(data["scans"][:16]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
        if s.initialized and k >= 4:
            # a radar frame 60 ms in the past
            ts_r = t_end - 0.06
            for fr in radar:
                if abs(fr["ts"] - ts_r) < 0.05:
                    s.add_radar(ts_r, fr["points"], fr["doppler"],
                                fr["snr_db"])
                    break
    c = s.counters
    handled = c.get("radar_ooo_inserted", 0) + c.get("radar_ooo_samekey", 0)
    assert handled >= 5, c
    assert c.get("radar_ooo_dropped", 0) <= 2, c
    # trajectory stays sane after insertions
    p_last = s.trajectory[-1][1]
    assert np.isfinite(p_last).all()
    # state timestamps strictly increasing
    assert all(a < b for a, b in zip(s.state_ts, s.state_ts[1:]))


def test_sequencer_scan_same_key_attaches():
    """A scan landing < min_imu_between_states IMU samples after the newest
    state must attach its ICP factors to that state (SUCCESS_SAME_KEY, ref
    sensor_manager_base.hpp:242 + graph/manager.cpp:424-439), not be
    dropped: the pose refines and the map can still update."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)

    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=4096, n_map_points=8192,
            geo_leaf=0.4, map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
            keyframe_rot_thresh=0.15, n_gn_iters=2),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32)

    imu = data["imu"]
    ii = 0
    for k, scan in enumerate(data["scans"][:12]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
        if s.initialized and k >= 4:
            # replay the same scan shifted 1 ms later: lands inside the
            # same-key window of the state just declared
            n_before = s.n_active
            ts_before = s.last_state_ts
            s.add_scan(scan["ts_header"] + 0.001, scan["points"],
                       scan["t_rel"], scan["valid"])
            assert s.n_active == n_before          # no new state
            assert s.last_state_ts == ts_before
    assert s.counters["scans_same_key"] >= 7, s.counters
    # the attached factors kept the estimate consistent (debug records
    # exist for same-key scans too, and inliers were found)
    rec = np.asarray(s.debug_records())
    assert rec.shape[0] == s.counters["scans"] - 1  # minus init scan
    same_key_rows = rec[2::2]   # every second processed scan is a replay
    assert (same_key_rows[:, 0] > 50).all(), same_key_rows[:, 0]
    p = np.asarray([p for _, p, _ in s.trajectory])
    assert np.isfinite(p).all()


def test_sequencer_scan_ooo_insertion():
    """A scan older than the newest state (beyond the same-key window but
    within max latency) must be inserted mid-window with IMU re-integration
    (ref graph/manager.cpp:267-417), or collapsed onto a neighbor — never
    dropped."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)

    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=4096, n_map_points=8192,
            geo_leaf=0.4, map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
            keyframe_rot_thresh=0.15, n_gn_iters=2,
            max_measurement_latency=0.5),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32)

    imu = data["imu"]
    ii = 0
    n_ooo_fed = 0
    for k, scan in enumerate(data["scans"][:14]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
        if s.initialized and k >= 5 and k % 2 == 1:
            # re-inject the PREVIOUS scan shifted to land mid-window,
            # 150 ms behind the newest state (a second lidar's arrival)
            old = data["scans"][k - 1]
            shift = (t_end - 0.15) - (old["ts_header"]
                                      + old["t_rel"].max())
            s.add_scan(old["ts_header"] + shift, old["points"],
                       old["t_rel"], old["valid"])
            n_ooo_fed += 1
    c = s.counters
    handled = c.get("scans_ooo_inserted", 0) + c.get("scans_ooo_samekey", 0)
    assert n_ooo_fed >= 4
    assert handled == n_ooo_fed, c
    assert c.get("scans_dropped_ooo", 0) == 0, c
    # window + trajectory stay finite and ordered after insertions
    assert list(s.state_ts) == sorted(s.state_ts)
    assert len(s.state_ts) == s.n_active
    p = np.asarray([p for _, p, _ in s.trajectory])
    assert np.isfinite(p).all()
    q = np.asarray(s.window.q)
    assert np.isfinite(q).all()


def test_sequencer_scan_ooo_densifies_map():
    """A mid-window OOO scan that meets the keyframe criteria must densify
    the map (main-path policy, ref geometric.cpp:440-478, applied to the
    inserted state's refined pose) and register its keyframe."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)

    # microscopic keyframe thresholds: every scan (incl. the OOO one) is a
    # keyframe, so the OOO insertion must grow the map
    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=4096, n_map_points=8192,
            geo_leaf=0.4, map_insert_leaf=0.15, keyframe_trans_thresh=1e-4,
            keyframe_rot_thresh=1e-5, n_gn_iters=2,
            max_measurement_latency=0.5),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32)

    imu = data["imu"]
    ii = 0
    for k, scan in enumerate(data["scans"][:8]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
            s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
            ii += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    occ_before = int(jnp.sum(s.vmap.occupied))
    kf_before = int(s.kf_count)
    # re-inject an earlier scan shifted to land mid-window, 150 ms behind
    # the newest state (beyond same-key, within max latency)
    old = data["scans"][6]
    shift = (t_end - 0.15) - (old["ts_header"] + old["t_rel"].max())
    s.add_scan(old["ts_header"] + shift, old["points"], old["t_rel"],
               old["valid"])
    assert s.counters.get("scans_ooo_inserted", 0) == 1, s.counters
    assert int(s.kf_count) == kf_before + 1
    assert int(jnp.sum(s.vmap.occupied)) > occ_before
