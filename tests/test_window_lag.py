"""Fixed-lag window semantics under multi-sensor declare rates.

Round-1 weakness (VERDICT #7): K = ceil(lag * assumed_10Hz_rate) silently
shortened the window in SECONDS when radar declares at 20-50 Hz (hornbill).
The reference's lag is a TIME bound (graph/manager.cpp:399-407 +
IncrementalFixedLagSmoother); SequencerConfig.lag_secs now enforces it by
age-based marginalization while K stays the static slot capacity.
"""

import jax.numpy as jnp
import numpy as np

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh

LAG = 0.5


def _replay(lag_secs, K, t_total=4.0):
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=t_total)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)
    traj = syn.make_trajectory(tc)
    radar = syn.generate_radar(traj, tc, rate=20.0, seed=0)

    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=max(4096, lm.n_rows * lm.n_cols),
            n_geo_points=2048, n_map_points=4096, geo_leaf=0.4,
            map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
            keyframe_rot_thresh=0.15, n_gn_iters=2, lag_secs=lag_secs),
        win_cfg=win.WindowConfig(K=K),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32)

    events = []
    for k, t in enumerate(data["imu"]["ts"]):
        events.append((t, 0, "imu", k))
    for k, scan in enumerate(data["scans"]):
        t_end = scan["ts_header"] + scan["t_rel"].max()
        events.append((t_end + 0.031, 2, "scan", k))
    for k, fr in enumerate(radar):
        events.append((fr["ts"] + 0.031, 1, "radar", k))
    events.sort(key=lambda e: (e[0], e[1]))

    spans, actives = [], []
    imu = data["imu"]
    for t, _, kind, k in events:
        if kind == "imu":
            s.add_imu(imu["ts"][k], imu["acc"][k], imu["gyro"][k])
        elif kind == "scan":
            sc = data["scans"][k]
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"])
        else:
            fr = radar[k]
            s.add_radar(fr["ts"], fr["points"], fr["doppler"], fr["snr_db"])
        # steady state: past the stationary init + one full lag
        if s.initialized and t > tc.t_stationary + 2 * LAG \
                and s.n_active >= 2:
            spans.append(s.state_ts[-1] - s.state_ts[0])
            actives.append(s.n_active)
    return s, np.asarray(spans), np.asarray(actives)


def test_window_covers_lag_under_20hz_radar_declares():
    """With K provisioned for the combined ~30 Hz declare rate and
    lag_secs set, the live window must span ~lag seconds — never collapse
    to K/declare_rate << lag, and never exceed lag by more than one
    declare interval."""
    s, spans, actives = _replay(lag_secs=LAG, K=18)
    assert len(spans) > 50
    # covers the lag (minus one declare interval of slack at ~30 Hz)
    assert np.median(spans) >= 0.8 * LAG, float(np.median(spans))
    # age-based marginalization really is the binding constraint:
    # the window never overruns the lag bound by a declare interval
    assert spans.max() <= LAG + 0.15, float(spans.max())
    # and capacity K never saturates (count-marginalization idle)
    assert actives.max() < 18, int(actives.max())
    assert s.counters["scans"] >= 25


def test_undersized_k_without_lag_shortens_window():
    """Control: round-1 behavior (lag_secs=0) with K sized for 10 Hz
    declares gives a window MUCH shorter than the lag under the combined
    ~30 Hz declare rate — the failure mode the lag semantics fix."""
    _, spans, _ = _replay(lag_secs=0.0, K=6)
    assert np.median(spans) < 0.5 * LAG, float(np.median(spans))
