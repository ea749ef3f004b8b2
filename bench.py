"""Headline benchmark: LiDAR scans/s per chip at fixed window size.

Replays a synthetic OS-0-128-scale sequence (128x1024 points per scan,
10 Hz equivalent, window K=8, 3+1 ICP linearizations per scan — matching
the reference's ENWIDE configuration: lag 0.5 s, 5 additional update
iterations, mimosa/config/enwide/params.yaml:30,52) through the full
Sequencer pipeline and reports steady-state scans/s.

Baseline: the reference sustains real-time 10 scans/s on a robot CPU
(BASELINE.md — no published numbers beyond real-time operation);
vs_baseline = scans_per_s / 10. Target >= 5.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def _tpu_alive(timeout_s=600):
    """Probe the tunneled TPU in a SUBPROCESS: a wedged relay claim hangs
    jax backend init forever (observed after killed TPU processes), and a
    hung bench leaves the driver with no artifact at all. A dead probe
    degrades the run to a CPU measurement instead."""
    import os
    import subprocess
    import sys
    if os.environ.get("JAX_PLATFORMS", "") in ("cpu",):
        return None            # user asked for CPU — not a degradation
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    tpu_ok = _tpu_alive()          # None = user-requested CPU
    import jax

    if tpu_ok is False:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: first-ever compile through the axon relay
    # costs minutes; cached reruns are seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    lm = syn.LidarModel(n_rows=128, n_cols=1024)   # OS-0-128 scale
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)

    # one shared step cache across all replays: a fresh Sequencer otherwise
    # re-traces each jitted step and re-queries the compile cache, which
    # costs seconds per program through the tunneled relay (keys carry a
    # config salt, so geo/photo/profile variants coexist)
    step_cache = {}

    def make_sequencer(photo=False, n_gn_iters=3, range_transfer=False):
        photo_cfg = None
        if photo:
            # full PG-LIO pipeline: intensity image build + FIR chain +
            # Sobel + NCC patch factors on top of geometric ICP
            from mimosa_tpu.lidar import photometric as ph
            photo_cfg = ph.PhotometricConfig(
                rows=lm.n_rows, cols=lm.n_cols, fov_up=lm.fov_up,
                fov_down=lm.fov_down, range_min=0.5, range_max=60.0,
                gradient_threshold=2.0, nma_radius=5, num_features=64,
                margin=3, intensity_scale=1.0)
        # the reference's ENWIDE point_skip_divisor=4 thins only the
        # geometric pipeline; photometric consumes the full cloud
        # (manager.cpp:244-335). Geometric-only replays subsample at pack
        # time (point_skip — 1/4 the transfer bytes); photometric replays
        # ship the full cloud and thin on-device (geo_skip).
        skip_kw = (dict(max_scan_points=lm.n_rows * lm.n_cols,
                        point_skip=1, geo_skip=4) if photo else
                   dict(max_scan_points=lm.n_rows * lm.n_cols // 4,
                        point_skip=4))
        return seq.Sequencer(
            photo_cfg=photo_cfg,
            # sensor-native range-image transfer: (r, t) int16 lanes +
            # device-side xyz reconstruction from the beam table — halves
            # H2D bytes vs the xyz int16 pack (the tunnel/PCIe, not
            # compute, bounds offline bulk replay). Exact for this
            # generator (radial range noise).
            ray_dirs=syn.beam_dirs(lm)[0] if range_transfer else None,
            seq_cfg=seq.SequencerConfig(
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=n_gn_iters, range_transfer=range_transfer,
                **skip_kw,
            ),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32,
            step_cache=step_cache,
        )

    imu = data["imu"]
    scans = data["scans"]

    def replay_once(photo=False, n_gn_iters=3, time_host=False,
                    range_transfer=False):
        """One full replay; returns (steady-state scans/s, sequencer,
        median per-scan wall ms). The median is the stall-robust figure
        for stage ATTRIBUTION (one relay hiccup — a late compile-cache
        query, a server-side GC — inflates a total-time rate 10-20x but
        moves a median of ~60 samples not at all; observed exactly that
        in a r3 session: the 0-GN attribution replay's total said 31
        scans/s while every per-scan sample sat at ~1.5 ms).
        ``time_host=True`` additionally medians the per-scan host time
        (pack + IMU feed — non-blocking work on the critical path)."""
        s = make_sequencer(photo, n_gn_iters=n_gn_iters,
                           range_transfer=range_transfer)
        host_ts = []
        scan_ts = []
        imu_i = 0

        def stage(i):
            sc = scans[i]
            return s.stage_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                                sc["valid"],
                                intensity=sc.get("intensity"))

        staged_next = stage(0)
        n_warm = min(20, len(scans) // 3)
        t0 = None
        for i in range(len(scans)):
            if i == n_warm:
                jax.block_until_ready(s.window.p)
                t0 = time.time()
            # production pattern (io/replay.py): scan i+1 is staged — its
            # host pack + H2D transfer in flight — while scan i runs on
            # device
            st = staged_next
            th0 = time.perf_counter() if (time_host or t0 is not None) \
                else 0.0
            j = int(np.searchsorted(imu["ts"], st["t_end"] + 0.03, "right"))
            if j > imu_i:
                s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                                imu["gyro"][imu_i:j])
                imu_i = j
            s.add_scan(st["ts_header"], staged=st)   # async dispatch
            if i + 1 < len(scans):
                staged_next = stage(i + 1)
                if time_host:
                    host_ts.append(time.perf_counter() - th0)
            if t0 is not None:
                scan_ts.append(time.perf_counter() - th0)
        jax.block_until_ready(s.window.p)
        rate = (len(scans) - n_warm) / (time.time() - t0)
        t_med = 1e3 * float(np.median(scan_ts))
        if time_host:
            return rate, s, t_med, 1e3 * float(np.median(host_ts[n_warm:]))
        return rate, s, t_med

    def replay_once_bulk(chunk=32, range_transfer=False):
        """Offline batch replay: stream the first n_warm scans (init +
        window fill + jit warm), then run the rest through
        add_scans_bulk — chunks of scan steps under one lax.scan dispatch
        (one packed H2D per chunk, zero per-scan host work)."""
        s = make_sequencer(range_transfer=range_transfer)
        imu = data["imu"]
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        n_warm = min(20, len(scans) // 3)
        for i in range(n_warm):
            sc = scans[i]
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"], intensity=sc.get("intensity"))
        jax.block_until_ready(s.window.p)
        t0 = time.time()
        s.add_scans_bulk(scans[n_warm:], chunk=chunk)
        jax.block_until_ready(s.window.p)
        return (len(scans) - n_warm) / (time.time() - t0), s

    # Median of 3 replays in one process: the dev tunnel's relay throughput
    # varies +-30% between sessions, so a single cold pass measures session
    # luck, not the chip. Repetition 1 also absorbs all compiles.
    rates = []
    scan_meds = []
    for _ in range(3):
        sps_i, s, t_med_i = replay_once()
        rates.append(sps_i)
        scan_meds.append(t_med_i)
    sps = float(np.median(rates))

    # offline bulk mode (same _scan_step math under lax.scan chunks)
    bulk_rates = []
    s_bulk = None
    for _ in range(3):
        sps_b, s_bulk = replay_once_bulk()
        bulk_rates.append(sps_b)
    sps_bulk = float(np.median(bulk_rates))

    # secondary figure: the full PG-LIO geometric+photometric pipeline
    photo_rates = []
    for _ in range(2):
        sps_p, _s2, _tm = replay_once(photo=True)
        photo_rates.append(sps_p)
    sps_photo = float(np.median(photo_rates))

    # sensor-native range-image codec (half the H2D bytes; same
    # estimator): streaming + bulk. Runs AFTER the xyz figures so a
    # relay-session downgrade triggered by the extra program compiles
    # (first run on a cold disk cache) cannot contaminate the headline.
    rt_rates, rt_bulk_rates = [], []
    s_rt = s_rtb = None
    for _ in range(2):
        r_i, s_rt, _tm = replay_once(range_transfer=True)
        rt_rates.append(r_i)
    for _ in range(2):
        r_i, s_rtb = replay_once_bulk(range_transfer=True)
        rt_bulk_rates.append(r_i)
    sps_rt = float(np.median(rt_rates))
    sps_rt_bulk = float(np.median(rt_bulk_rates))

    # ---- per-stage attribution (ref LidarManagerDebug t_* stage fields):
    # the relay's session-to-session throughput swings ±30%, so the
    # headline number alone cannot localize a regression. Attribution is
    # measured with the SAME async pattern as the headline (any blocked
    # measurement on a tunneled device is dominated by ~25 ms sync
    # round-trips, not pipeline time — r2's floor-subtraction numbers
    # were relay artifacts) and uses per-scan MEDIANS, not total-time
    # rates (a single relay stall — late compile-cache query, server GC —
    # inflates a 60-scan total 10-20x; r3 observed rate0=31/s with every
    # per-scan sample at 1.5 ms): t_scan = median per-scan wall; t_gn =
    # median diff vs a 0-GN-iteration replay (same program minus the GN
    # loop); t_host = median non-blocking host work per scan (pack + IMU
    # feed + dispatch python).
    _r0, _s0, t_scan_nogn_ms, t_host_ms = replay_once(n_gn_iters=0,
                                                      time_host=True)
    t_scan_ms = float(np.median(scan_meds))
    t_gn_ms = max(t_scan_ms - t_scan_nogn_ms, 0.0)

    # ALL device->host fetches (trajectory reads for ATE) happen strictly
    # AFTER the last timed replay: the first end-of-replay fetch knocks
    # the relay session off streamed dispatch and pins every SUBSEQUENT
    # replay in the process at ~41 scans/s (probe_poison2/3 phase D —
    # exactly how r2's attribution fields got poisoned)
    def _ate(sq):
        ts = np.asarray([t for t, _, _ in sq.trajectory])
        p = np.asarray([p for _, p, _ in sq.trajectory])
        return syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"])

    ate = _ate(s)
    ate_bulk = _ate(s_bulk)
    ate_rt = _ate(s_rt)
    ate_rt_bulk = _ate(s_rtb)

    # ATE gate: a codec/schedule variant only competes for the headline
    # if its trajectory tracked (guards against a fast-but-broken path)
    cands = [(sps, "streaming", ate), (sps_bulk, "offline-bulk", ate_bulk),
             (sps_rt, "streaming-range", ate_rt),
             (sps_rt_bulk, "offline-bulk-range", ate_rt_bulk)]
    ok = [c for c in cands if c[2] < 0.05] or cands[:2]
    best, best_mode, _ = max(ok, key=lambda c: c[0])
    print(json.dumps({
        "metric": "lidar_scans_per_s_per_chip",
        # the best replay schedule/codec of the SAME pipeline: streaming
        # (per-scan dispatch, the online pattern) vs bulk (lax.scan
        # chunks, the offline batch pattern), each with the xyz-int16 or
        # the sensor-native range-image transfer codec — all produce the
        # gated trajectory (ate_m fields)
        "value": round(best, 2),
        "unit": "scans/s (128x1024 pts, K=8 window, 3+1 ICP linearize)",
        "vs_baseline": round(best / 10.0, 2),
        "mode": best_mode,
        "streaming_scans_per_s": round(sps, 2),
        "ate_m": round(ate, 4),
        "photo_scans_per_s": round(sps_photo, 2),
        # offline batch mode: identical per-scan program under lax.scan
        # chunks (one dispatch + one packed transfer per 32 scans)
        "bulk_scans_per_s": round(sps_bulk, 2),
        "bulk_ate_m": round(ate_bulk, 4),
        "bulk_rates_all_runs": [round(r, 1) for r in bulk_rates],
        # sensor-native range-image codec (half the H2D bytes)
        "range_scans_per_s": round(sps_rt, 2),
        "range_ate_m": round(ate_rt, 4),
        "range_bulk_scans_per_s": round(sps_rt_bulk, 2),
        "range_bulk_ate_m": round(ate_rt_bulk, 4),
        "t_scan_ms": round(t_scan_ms, 3),
        "t_scan_nogn_ms": round(t_scan_nogn_ms, 3),
        "t_host_ms": round(t_host_ms, 3),
        "t_gn_ms": round(t_gn_ms, 3),
        "rates_all_runs": [round(r, 1) for r in rates],
        "platform": jax.devices()[0].platform,
        # True ONLY when the TPU probe failed (not a user-requested CPU
        # run) — compare against BENCH_r*.json TPU figures, not this
        **({"tpu_unavailable_fallback": True} if tpu_ok is False else {}),
    }))


if __name__ == "__main__":
    main()
