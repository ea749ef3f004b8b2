"""Bulk (offline batch) replay: lax.scan chunks must reproduce the
streaming path exactly — same program, different scheduling."""

import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


# one module-wide step cache: every equivalence test builds a
# streaming + a bulk sequencer of the SAME config — sharing halves the
# XLA CPU compiles (the dominant cost of this module), and repeated
# configs across tests reuse programs outright. Distinct cfg_kw get
# distinct salts automatically.
_STEP_CACHE = {}


def _make_sequencer(photo_cfg=None, **kw):
    return seq.Sequencer(
        photo_cfg=photo_cfg, step_cache=_STEP_CACHE,
        seq_cfg=seq.SequencerConfig(
            max_scan_points=4096, n_geo_points=2048, n_map_points=4096,
            geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2, **kw),
        win_cfg=win.WindowConfig(K=4),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(),
        dtype=jnp.float32,
    )


def _photo_cfg(lm):
    from mimosa_tpu.lidar import photometric as ph
    return ph.PhotometricConfig(
        rows=lm.n_rows, cols=lm.n_cols, fov_up=lm.fov_up,
        fov_down=lm.fov_down, range_min=0.5, range_max=40.0,
        gradient_threshold=2.0, nma_radius=5, num_features=32,
        margin=3, intensity_scale=1.0, filter_brightness=False,
        remove_lines=False)


LM = syn.LidarModel(n_rows=16, n_cols=256)


@pytest.fixture(scope="module")
def data():
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=6.0)
    return syn.generate(world, tc, LM, seed=0)


def _replay(data, bulk, chunk=8, **cfg_kw):
    s = _make_sequencer(**cfg_kw)
    imu = data["imu"]
    s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
    if bulk:
        s.add_scans_bulk(data["scans"], chunk=chunk)
    else:
        for sc in data["scans"]:
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc.get("valid"), intensity=sc.get("intensity"))
    return s


def test_bulk_matches_streaming(data):
    s0 = _replay(data, bulk=False)
    s1 = _replay(data, bulk=True)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    assert s0.counters["scans"] == s1.counters["scans"]
    assert s0.scan_idx == s1.scan_idx
    assert s0.state_ts == pytest.approx(s1.state_ts, abs=0.0)
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        # identical math, different program boundaries: XLA fusion may
        # reorder f32 reductions, so allow tiny per-scan drift
        np.testing.assert_allclose(p0, p1, atol=2e-3)
        assert min(np.linalg.norm(q0 - q1), np.linalg.norm(q0 + q1)) < 2e-3
    # debug records follow the same layout/indices
    d0 = s0.debug_records()
    d1 = s1.debug_records()
    assert d0.shape == d1.shape
    np.testing.assert_allclose(d0[:, 0], d1[:, 0], atol=64)  # inliers


def test_bulk_matches_streaming_merged_marg(data):
    """Against the merged-marginalization streaming variant (the exact
    same per-scan program the bulk body runs)."""
    s0 = _replay(data, bulk=False, merge_marginalize=True)
    s1 = _replay(data, bulk=True)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        np.testing.assert_allclose(p0, p1, atol=2e-3)


@pytest.mark.heavy
def test_bulk_photometric_matches_streaming(data):
    """The flagship PG-LIO pipeline (geometric + photometric) through the
    bulk lax.scan scheduler: feature store/track state rides the chunk
    carry, so trajectories AND tracked-feature debug records must match
    the streaming path (VERDICT r3 item 2 — the headline mode and the
    headline pipeline had never met)."""
    pc = _photo_cfg(LM)
    s0 = _replay(data, bulk=False, photo_cfg=pc)
    s1 = _replay(data, bulk=True, photo_cfg=pc)
    assert any(str(k[1]) == "bulk" for k in s1._step_cache
               if isinstance(k, tuple) and len(k) > 1)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    assert s0.state_ts == pytest.approx(s1.state_ts, abs=0.0)
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        np.testing.assert_allclose(p0, p1, atol=2e-3)
        assert min(np.linalg.norm(q0 - q1), np.linalg.norm(q0 + q1)) < 2e-3
    d0 = s0.debug_records()
    d1 = s1.debug_records()
    # photometric actually ran (tracked features nonzero) and matches
    assert d0[:, 12].sum() > 0
    np.testing.assert_allclose(d0[:, 12], d1[:, 12], atol=4)


@pytest.mark.heavy
def test_bulk_photometric_exact_ouster_matches_streaming():
    """Bulk + the exact Ouster sampling model (destagger pixel-id fill,
    per-row yaw table, projectUndistorted re-skew): the production
    ENWIDE photometric configuration must survive the lax.scan chunk
    scheduler unchanged (VERDICT r3 item 2, second case)."""
    from mimosa_tpu.lidar import photometric as ph
    rows, cols = 16, 256
    alts = np.radians(np.linspace(22.0, -22.0, rows))
    rng = np.random.default_rng(3)
    shifts = rng.integers(0, cols, rows)
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    d = syn.generate_ouster(world, tc, alts, shifts, n_cols=cols, seed=0)
    pc = ph.PhotometricConfig(
        rows=rows, cols=cols, range_min=0.5, range_max=40.0,
        beam_altitudes=tuple(float(a) for a in alts),
        gradient_threshold=2.0, nma_radius=5, num_features=32, margin=3,
        intensity_scale=1.0, filter_brightness=False, remove_lines=False,
        exact_ouster=True,
        pixel_shift_by_row=tuple(int(s) for s in shifts))
    s0 = _replay(d, bulk=False, photo_cfg=pc)
    s1 = _replay(d, bulk=True, photo_cfg=pc)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        np.testing.assert_allclose(p0, p1, atol=2e-3)
    d0, d1 = s0.debug_records(), s1.debug_records()
    assert d0[:, 12].sum() > 0          # exact-model tracking active
    np.testing.assert_allclose(d0[:, 12], d1[:, 12], atol=4)


def test_bulk_ate_gate(data):
    s = _replay(data, bulk=True)
    est_ts = np.asarray([t for t, _, _ in s.trajectory])
    est_p = np.asarray([p for _, p, _ in s.trajectory])
    ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"], data["gt"]["pos"])
    assert ate < 0.05


def test_bulk_chunk_splitting(data):
    """Runs split greedily into halving chunks; odd remainders stream."""
    s = _replay(data, bulk=True, chunk=4)
    assert s.counters["scans"] == len(data["scans"])
    assert len(s.trajectory) == len(data["scans"])


def test_f64_sequencer_smoke():
    """The f64 oracle path end-to-end: the per-scan IMU pack follows the
    Sequencer dtype (advisor r2: a f32 pack silently truncated f64 runs),
    and the whole scan step runs in f64 (conftest enables x64)."""
    from mimosa_tpu.io import synthetic_replay as sr
    out = sr.run(dtype="float64", t_total=4.0, verbose=False)
    assert out["ate"] < 0.05
    assert out["sequencer"].window.p.dtype == jnp.float64


@pytest.fixture(scope="module")
def radar_frames():
    tc = syn.TrajectoryConfig(t_total=6.0)
    traj = syn.make_trajectory(tc)
    return syn.generate_radar(traj, tc, seed=0)


def _replay_mm(data, radar, bulk, chunk=8, odom=(), **cfg_kw):
    """Scans + radar (+ odometry) through add_bulk, or streaming in the
    same dispatch order (scan at t_end, radar/odom at ts — what add_bulk
    sorts to)."""
    s = _make_sequencer(**cfg_kw)
    imu = data["imu"]
    s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
    msgs = list(data["scans"]) + [
        dict(kind="radar", ts=fr["ts"], points_r=fr["points"],
             doppler=fr["doppler"], snr_db=fr["snr_db"]) for fr in radar
    ] + [dict(kind="odom", ts=m["ts"], q=m["q"], p=m["t"], cov6=m["cov"])
         for m in odom]
    if bulk:
        s.add_bulk(msgs, chunk=chunk)
        return s
    items = []
    for m in msgs:
        kind = m.get("kind", "scan")
        code = {"scan": 0, "radar": 1, "odom": 2}[kind]
        ts = seq.Sequencer._scan_t_end(m) if code == 0 else float(m["ts"])
        items.append((ts, code, m))
    items.sort(key=lambda e: (e[0], e[1]))
    for _, code, m in items:
        if code == 1:
            s.add_radar(m["ts"], m["points_r"], m["doppler"],
                        m.get("snr_db"))
        elif code == 2:
            s.add_odometry(m["ts"], m["q"], m["p"], m.get("cov6"))
        else:
            s.add_scan(m["ts_header"], m["points"], m["t_rel"],
                       m.get("valid"))
    return s


@pytest.mark.heavy
def test_bulk_multimodal_matches_streaming(data, radar_frames):
    """Mixed scan+radar lax.scan chunks (lidar+radar+IMU, the hornbill
    stack) must reproduce the streaming declare/same-key sequence."""
    s0 = _replay_mm(data, radar_frames, bulk=False)
    s1 = _replay_mm(data, radar_frames, bulk=True)
    # the multimodal chunk program actually ran (not all-fallback)
    assert any("bulkmm" in str(k) for k in s1._step_cache)
    assert s1.counters["radar_frames"] == len(radar_frames)
    assert s0.counters["scans"] == s1.counters["scans"]
    assert s0.state_ts == pytest.approx(s1.state_ts, abs=0.0)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    assert s0._traj_src == s1._traj_src
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        # identical math, different program boundaries (see
        # test_bulk_matches_streaming)
        np.testing.assert_allclose(p0, p1, atol=5e-3)
        assert min(np.linalg.norm(q0 - q1), np.linalg.norm(q0 + q1)) < 5e-3


def test_bulk_four_modality_matches_streaming(data, radar_frames):
    """Full 4-modality bulk (lidar + radar + odometry + IMU, the
    reference's complete sensor set): mixed chunks incl. the odometry
    between-factor branches must reproduce the streaming sequence."""
    tc = syn.TrajectoryConfig(t_total=6.0)
    traj = syn.make_trajectory(tc)
    odom = syn.generate_odometry(traj, tc, seed=0)
    s0 = _replay_mm(data, radar_frames, bulk=False, odom=odom)
    s1 = _replay_mm(data, radar_frames, bulk=True, odom=odom)
    assert s1.counters.get("odom_msgs", 0) == len(odom)
    assert s0.counters.get("odom_msgs", 0) == len(odom)
    assert s0.counters.get("odom_dropped", 0) == \
        s1.counters.get("odom_dropped", 0)
    assert s0.state_ts == pytest.approx(s1.state_ts, abs=0.0)
    t0 = s0.trajectory
    t1 = s1.trajectory
    assert len(t0) == len(t1)
    assert s0._traj_src == s1._traj_src
    for (ts0, p0, q0), (ts1, p1, q1) in zip(t0, t1):
        assert ts0 == ts1
        np.testing.assert_allclose(p0, p1, atol=5e-3)


def test_bulk_multimodal_ate_gate(data, radar_frames):
    s = _replay_mm(data, radar_frames, bulk=True)
    rows = [(t, p) for (t, p, _), src in zip(s.trajectory, s._traj_src)
            if src >= 0]
    est_ts = np.asarray([t for t, _ in rows])
    est_p = np.asarray([p for _, p in rows])
    ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"], data["gt"]["pos"])
    assert ate < 0.05


def test_bulk_lag_fallback(data):
    """lag_secs forcing extra marginalizations must fall back cleanly."""
    s0 = _replay(data, bulk=False, lag_secs=0.25)
    s1 = _replay(data, bulk=True, lag_secs=0.25)
    assert len(s0.trajectory) == len(s1.trajectory)
    assert s0.state_ts == pytest.approx(s1.state_ts, abs=0.0)
    for (ts0, p0, _), (ts1, p1, _) in zip(s0.trajectory, s1.trajectory):
        assert ts0 == ts1
        np.testing.assert_allclose(p0, p1, atol=5e-3)
