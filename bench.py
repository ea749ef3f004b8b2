"""Headline benchmark: LiDAR scans/s per chip at fixed window size.

Replays a synthetic OS-0-128-scale sequence (128x1024 points per scan,
10 Hz equivalent, window K=8, 3+1 ICP linearizations per scan — matching
the reference's ENWIDE configuration: lag 0.5 s, 5 additional update
iterations, mimosa/config/enwide/params.yaml:30,52) through the full
Sequencer pipeline and reports steady-state scans/s.

Schedule/codec variants (streaming vs offline-bulk x xyz-int16 vs
sensor-native range codec, plus the geo+photometric PG-LIO pipeline in
both schedules) are measured ROUND-ROBIN — every variant runs once per
round, repeated R rounds — so each per-variant median aggregates samples
spread across the whole process lifetime. The tunneled relay's
throughput drifts/steps WITHIN a session (r3: the range codec measured
2.4x slower than the fatter xyz codec purely because it ran last);
interleaving makes variant-vs-variant deltas in-session paired instead
of session-phase artifacts. A dispatch-floor relay-health probe runs at
start/mid/end so round-over-round headline swings are attributable to
the session, not the code.

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

    if tpu_ok is None or tpu_ok is False:
        # the container sitecustomize FORCES jax_platforms to the tunneled
        # TPU and ignores the env var (CLAUDE.md) — apply the CPU request
        # (or the dead-TPU degradation) via the config instead
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

    import os
    # smoke knobs (CI/CPU): MIMOSA_BENCH_TT trims the sequence length,
    # MIMOSA_BENCH_ROWS the scan height — the TPU artifact uses defaults
    _tt = float(os.environ.get("MIMOSA_BENCH_TT", 9.0))
    _rows = int(os.environ.get("MIMOSA_BENCH_ROWS", 128))
    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    tc = syn.TrajectoryConfig(t_total=_tt, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    lm = syn.LidarModel(n_rows=_rows, n_cols=1024)   # OS-0-128 scale
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)

    # relay-health probe: median wall per CHAINED tiny jitted dispatch
    # (no readbacks — readbacks would themselves poison the session,
    # CLAUDE.md). A healthy streamed-dispatch session sits at ~0.1-0.3 ms;
    # a degraded one at ~25 ms/program. Run at start/mid/end so the
    # artifact can attribute a headline swing to session luck.
    _probe_x = jax.device_put(np.zeros(8, np.float32))
    _probe_f = jax.jit(lambda x: x * 1.000001 + 1.0)

    def relay_floor_ms(n=60):
        y = _probe_f(_probe_x)            # warm/compile outside timing
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = _probe_f(y)
        jax.block_until_ready(y)
        return 1e3 * (time.perf_counter() - t0) / n

    # one shared step cache across all replays: a fresh Sequencer otherwise
    # re-traces each jitted step and re-queries the compile cache, which
    # costs seconds per program through the tunneled relay (keys carry a
    # config salt, so geo/photo/profile variants coexist)
    step_cache = {}

    def make_sequencer(photo=False, n_gn_iters=3, range_transfer=False,
                       mesh=None):
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
            photo_cfg=photo_cfg, mesh=mesh,
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
                    range_transfer=False, mesh=None, sync=False):
        """One full replay; returns (steady-state scans/s, sequencer,
        median per-scan wall ms [, median host ms]). The median is the
        stall-robust figure for stage ATTRIBUTION (one relay hiccup — a
        late compile-cache query, a server-side GC — inflates a
        total-time rate 10-20x but moves a median of ~60 samples not at
        all; observed exactly that in a r3 session: the 0-GN attribution
        replay's total said 31 scans/s while every per-scan sample sat
        at ~1.5 ms). ``time_host=True`` additionally medians the
        per-scan host time (pack + IMU feed — non-blocking work on the
        critical path). ``sync=True`` blocks on the updated window after
        every scan: the per-scan wall then INCLUDES the device step time
        instead of overlapping it — required for GN attribution (in the
        async pattern the ~0.1-0.4 ms GN device cost hides entirely
        under the ~1.5 ms host wall, which is why r3/r4's async-paired
        t_gn was vacuous twice)."""
        s = make_sequencer(photo, n_gn_iters=n_gn_iters,
                           range_transfer=range_transfer, mesh=mesh)
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
            if sync:
                jax.block_until_ready(s.window.p)
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

    def replay_once_bulk(chunk=32, range_transfer=False, photo=False):
        """Offline batch replay: stream the first n_warm scans (init +
        window fill + jit warm), then run the rest through
        add_scans_bulk — chunks of scan steps under one lax.scan dispatch
        (one packed H2D per chunk, zero per-scan host work)."""
        s = make_sequencer(photo=photo, range_transfer=range_transfer)
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

    # ---- round-robin measurement: every variant runs once per ROUND so
    # per-variant medians aggregate samples from the same session phases
    # (r3's sequential layout measured the half-the-bytes range codec
    # 2.4x SLOWER than the fat codec purely because it ran last). Round 0
    # absorbs every program's compile; the headline median uses WARM
    # rounds only (r4's photo-bulk figure was the lower of two warm
    # samples because the cold round entered its median of 3).
    VARIANTS = [
        ("streaming", dict()),
        ("offline-bulk", dict(bulk=True)),
        ("streaming-range", dict(range_transfer=True)),
        ("offline-bulk-range", dict(bulk=True, range_transfer=True)),
        ("photo-streaming", dict(photo=True)),
        ("photo-bulk", dict(bulk=True, photo=True)),
        # photo-bulk H2D fix (r5): the full-cloud photo chunk slab is
        # 42 MB and the relay session's H2D bandwidth (0.4-1.7 GB/s,
        # session luck) is the photo-bulk wall (probe_r5: t_bulk_put
        # 141 ms of a ~180 ms chunk); the sensor-native range codec
        # cuts the slab to 25 MB (6 B/pt vs 10)
        ("photo-bulk-range", dict(bulk=True, photo=True,
                                  range_transfer=True)),
        # same pipeline through the mesh-sharded kernels on a 1-device
        # mesh: the single-chip sharding tax — the measurable prefix of
        # pod-scale efficiency (parallel/sharded.py's first perf datum
        # on real hardware). Excluded from the headline: it answers
        # "what does the mesh path cost", not "how fast is the chip".
        ("sharded-streaming", dict(sharded=True)),
    ]
    # CPU (CI smoke / dead-TPU fallback): every variant salt is a FULL
    # program set in THIS process's LLVM JIT code region, and 8 variants
    # + the 12-GN attribution set exceed its reservation (measured r5:
    # alloc-failure flood -> segfault, the same limit as the fuzz,
    # tests/fuzz_worker.py). Keep the r4-proven 6-variant fleet and skip
    # the wide-spread GN pairing there; the TPU artifact (remote
    # executables, no local JIT) runs everything.
    cpu_lite = tpu_ok is not True
    if cpu_lite:
        VARIANTS = [(n, kw) for n, kw in VARIANTS
                    if n not in ("photo-bulk-range", "sharded-streaming")]
    R = 4
    rates = {name: [] for name, _ in VARIANTS}
    scan_meds = []                  # per-round streaming 3-GN per-scan ms
    host_meds = []
    gn_hi_meds, gn_lo_meds = [], []   # per-round SYNC 12-GN / 0-GN ms
    bulk_timers = {}                # variant -> last timers summary
    seqs = {}                       # last sequencer per variant (for ATE)
    shard_error = None
    _mesh = None
    floors = [relay_floor_ms()]
    for r in range(R):
        for name, kw in VARIANTS:
            if kw.get("sharded"):
                if shard_error is not None:
                    continue
                try:
                    from mimosa_tpu.parallel import sharded as par
                    if _mesh is None:
                        _mesh = par.make_mesh(1, n_mp=1)
                    rate_i, s_i, _tm = replay_once(mesh=_mesh)
                except Exception as e:   # noqa: BLE001 — the artifact
                    # must survive a mesh-path failure (first TPU run)
                    shard_error = repr(e)
                    continue
            elif kw.get("bulk"):
                rate_i, s_i = replay_once_bulk(
                    range_transfer=kw.get("range_transfer", False),
                    photo=kw.get("photo", False))
                bulk_timers[name] = s_i.timers.summary()
            else:
                rate_i, s_i, t_med_i = replay_once(
                    photo=kw.get("photo", False),
                    range_transfer=kw.get("range_transfer", False))
                if name == "streaming":
                    scan_meds.append(t_med_i)
                    # GN attribution: paired SYNC replays (block on the
                    # window each scan so the device step is ON the
                    # measured wall instead of overlapped by host work —
                    # async pairing was vacuous two rounds running
                    # because the ~0.1-0.4 ms GN cost hides entirely
                    # under the ~1.5 ms async host wall) at 12 vs 0 GN
                    # iterations: the 12-iteration spread lifts the
                    # delta well above the relay's per-dispatch jitter;
                    # scale back to the headline's 3 iterations.
                    if not cpu_lite:
                        _r12, _s12, t_hi = replay_once(n_gn_iters=12,
                                                       sync=True)
                        gn_hi_meds.append(t_hi)
                    _r0, _s0, t_lo, t_host_i = replay_once(
                        n_gn_iters=0, sync=True, time_host=True)
                    gn_lo_meds.append(t_lo)
                    host_meds.append(t_host_i)
            rates[name].append(rate_i)
            seqs[name] = s_i
        if r == R // 2 or R == 1:
            floors.append(relay_floor_ms())   # true mid-run probe
    floors.append(relay_floor_ms())

    # warm-only medians: drop the compile round (round 0) whenever at
    # least two warm samples exist; report raw per-round rates alongside
    med = {name: float(np.median(rs[1:] if len(rs) >= 3 else rs))
           for name, rs in rates.items() if rs}
    t_scan_ms = float(np.median(scan_meds))
    # per-round paired sync deltas (12-GN minus adjacent 0-GN) = 12
    # GN-iteration device costs; headline runs 3 iterations
    t_gn_deltas = [a - b for a, b in zip(gn_hi_meds, gn_lo_meds)]
    t_gn_unit_ms = (float(np.median(t_gn_deltas)) / 12.0
                    if t_gn_deltas else float("nan"))
    t_gn_ms = 3.0 * t_gn_unit_ms
    t_step_sync_ms = float(np.median(gn_lo_meds))
    t_host_ms = float(np.median(host_meds))

    # ALL device->host fetches (trajectory reads for ATE) happen strictly
    # AFTER the last timed replay: the first readback knocks the relay
    # session off streamed dispatch and pins every SUBSEQUENT replay in
    # the process at ~41 scans/s (probe_poison2/3 phase D — exactly how
    # r2's attribution fields got poisoned)
    def _ate(sq):
        ts = np.asarray([t for t, _, _ in sq.trajectory])
        p = np.asarray([p for _, p, _ in sq.trajectory])
        return syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"])

    ates = {name: _ate(s_i) for name, s_i in seqs.items()}

    # ATE gate: a codec/schedule variant only competes for the headline
    # if its trajectory tracked (guards against a fast-but-broken path).
    # If EVERY variant fails the gate the round is broken — say so loudly
    # (gate_failed + an "ungated-" mode prefix) instead of silently
    # crowning a fast-but-wrong run (r3 advisor finding).
    cands = [(med[name], name, ates[name]) for name, _ in VARIANTS
             if name in med and not name.startswith("sharded")]
    ok = [c for c in cands if c[2] < 0.05]
    gate_failed = not ok
    best, best_mode, _ = max(ok or cands, key=lambda c: c[0])
    if gate_failed:
        best_mode = "ungated-" + best_mode
    print(json.dumps({
        "metric": "lidar_scans_per_s_per_chip",
        # the best ATE-gated replay schedule/codec of the SAME pipeline:
        # streaming (per-scan dispatch, the online pattern) vs bulk
        # (lax.scan chunks, the offline batch pattern), each with the
        # xyz-int16 or the sensor-native range-image transfer codec
        "value": round(best, 2),
        "unit": "scans/s (128x1024 pts, K=8 window, 3+1 ICP linearize)",
        "vs_baseline": round(best / 10.0, 2),
        "mode": best_mode,
        **({"gate_failed": True} if gate_failed else {}),
        "streaming_scans_per_s": round(med["streaming"], 2),
        "ate_m": round(ates["streaming"], 4),
        # full PG-LIO pipeline (geo+photometric), both schedules
        "photo_scans_per_s": round(med["photo-streaming"], 2),
        "photo_ate_m": round(ates["photo-streaming"], 4),
        "photo_bulk_scans_per_s": round(med["photo-bulk"], 2),
        "photo_bulk_ate_m": round(ates["photo-bulk"], 4),
        **({"photo_bulk_range_scans_per_s":
                round(med["photo-bulk-range"], 2),
            "photo_bulk_range_ate_m":
                round(ates["photo-bulk-range"], 4)}
           if "photo-bulk-range" in med else {}),
        # offline batch mode: identical per-scan program under lax.scan
        # chunks (one dispatch + one packed transfer per 32 scans)
        "bulk_scans_per_s": round(med["offline-bulk"], 2),
        "bulk_ate_m": round(ates["offline-bulk"], 4),
        # sensor-native range-image codec (half the H2D bytes)
        "range_scans_per_s": round(med["streaming-range"], 2),
        "range_ate_m": round(ates["streaming-range"], 4),
        "range_bulk_scans_per_s": round(med["offline-bulk-range"], 2),
        "range_bulk_ate_m": round(ates["offline-bulk-range"], 4),
        # single-chip sharding tax: the identical streaming replay
        # through the mesh-sharded kernels (1-device mesh) — bounds the
        # mesh path's constant cost (collective/reshard overhead at
        # n=1); the measurable prefix of the >=0.8 pod-efficiency
        # target (BASELINE.md) in a 1-chip environment
        **({"sharded_scans_per_s": round(med["sharded-streaming"], 2),
            "sharded_ate_m": round(ates["sharded-streaming"], 4),
            "shard_overhead_pct": round(
                100.0 * (1.0 - med["sharded-streaming"]
                         / med["streaming"]), 1)}
           if "sharded-streaming" in med else
           {"shard_skipped_cpu": True} if cpu_lite else
           {"shard_error": shard_error}),
        # per-stage attribution (ref LidarManagerDebug t_* fields).
        # t_scan/t_host: async-pattern per-scan medians (the headline
        # pattern). t_gn: DEVICE-side GN cost at the headline's 3
        # iterations, from per-round adjacent SYNC 12-GN/0-GN pairings
        # scaled by 3/12 (async pairing cannot see device time — it
        # overlaps under the host wall; r3/r4's vacuous t_gn measured
        # exactly that). t_step_sync: full synchronous per-scan wall at
        # 0 GN iters (host + device + relay round-trip).
        "t_scan_ms": round(t_scan_ms, 3),
        "t_host_ms": round(t_host_ms, 3),
        "t_step_sync_ms": round(t_step_sync_ms, 3),
        **({"t_gn_ms": round(t_gn_ms, 3),
            "t_gn_unit_ms": round(t_gn_unit_ms, 4),
            "t_gn_deltas_ms": [round(d, 3) for d in t_gn_deltas],
            # all (or all-but-one) 12-0 sync deltas positive: the
            # spread resolved the GN cost above session jitter —
            # t_gn_ms is real
            "t_gn_consistent": bool(
                t_gn_ms > 0
                and sum(d > 0 for d in t_gn_deltas)
                >= len(t_gn_deltas) - 1)}
           if t_gn_deltas else {"t_gn_skipped_cpu": True}),
        # host-side bulk chunk stage split (pack / H2D put / dispatch
        # mean ms per 32-scan chunk) for the geo and the photometric
        # bulk paths — the photo-bulk-vs-streaming gap attribution
        "bulk_stages_ms": {
            name: {k: round(v["mean_ms"], 3)
                   for k, v in tmr.items() if k.startswith("t_bulk")}
            for name, tmr in bulk_timers.items()},
        # relay session health: dispatch-floor ms at start/mid/end
        # (healthy streamed session ~0.1-0.3; degraded ~25). Explains
        # round-over-round headline swings: compare these before blaming
        # the code.
        "relay_floor_ms": [round(f, 3) for f in floors],
        # raw per-round rates, interleaved order — variant deltas within
        # a round are in-session paired
        "rates_by_variant": {k: [round(r, 1) for r in v]
                             for k, v in rates.items()},
        "platform": jax.devices()[0].platform,
        # True ONLY when the TPU probe failed (not a user-requested CPU
        # run) — compare against BENCH_r*.json TPU figures, not this
        **({"tpu_unavailable_fallback": True} if tpu_ok is False else {}),
    }))


if __name__ == "__main__":
    main()
