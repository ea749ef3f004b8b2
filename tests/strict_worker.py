"""Subprocess worker for the strict-value bulk tier (test_bulk_strict.py).

Runs ONE seed at the non-chaotic 16x256 shape in a fresh process
(same LLVM JIT code-memory constraint as tests/fuzz_worker.py) and
prints one STRICTRESULT JSON line. With ``--mutate``, wraps
``Sequencer._run_bulk_chunk`` to perturb the packed segment-relative
t_end scalar by 1 ms — the teeth check for the strict pointwise gate.

Usage: python tests/strict_worker.py SEED [--mutate]
"""

import json
import os
import sys

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import numpy as np
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh
    import test_bulk_strict as ts

    sd = int(sys.argv[1])
    mutate = "--mutate" in sys.argv[2:]

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=3.5)
    lm = syn.LidarModel(n_rows=16, n_cols=256)   # non-chaotic shape
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.005,
                        range_noise=0.01)
    base = (data, None, tc)
    msgs, chunk = ts._strict_stream(base, sd)

    step_cache = {}

    def make_sequencer():
        return seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                max_scan_points=4096, n_geo_points=2048,
                n_map_points=4096, geo_leaf=0.4, map_insert_leaf=0.15,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=1),
            win_cfg=win.WindowConfig(K=4),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32, step_cache=step_cache)

    def replay(bulk):
        s = make_sequencer()
        imu = data["imu"]
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        if bulk:
            if mutate:
                orig = seq.Sequencer._run_bulk_chunk

                def mutated(self, scans, t_ends):
                    # value-level bulk-path mutation: shift the packed
                    # segment-relative t_end (imu_packs[k, m, 1]) by
                    # 5 ms via the t_ends the pack loop consumes —
                    # every downstream scalar (deskew window,
                    # preintegration end) inherits it (measured: 1 ms
                    # -> 3.7 mm pointwise divergence, already above the
                    # 2 mm gate; 5 ms gives clear margin)
                    return orig(self, scans,
                                [t + 5e-3 for t in t_ends])
                s._run_bulk_chunk = mutated.__get__(s)
            s.add_scans_bulk(msgs, chunk=chunk)
            return s
        for m in sorted(msgs, key=seq.Sequencer._scan_t_end):
            s.add_scan(m["ts_header"], m["points"], m["t_rel"],
                       m.get("valid"))
        return s

    s0 = replay(bulk=False)
    s1 = replay(bulk=True)
    t0, t1 = s0.trajectory, s1.trajectory
    max_dp = max((float(np.linalg.norm(np.asarray(p0) - np.asarray(p1)))
                  for (_, p0, _), (_, p1, _) in zip(t0, t1)),
                 default=0.0)

    def _ate(s_):
        ts_ = np.asarray([t for t, _, _ in s_.trajectory])
        p = np.asarray([p for _, p, _ in s_.trajectory])
        return float(syn.ate_rmse(ts_, p, data["gt"]["ts"],
                                  data["gt"]["pos"]))

    COUNTER_KEYS = ("scans", "scans_same_key", "scans_no_imu",
                    "scans_dropped_ooo")
    print("STRICTRESULT " + json.dumps(dict(
        seed=sd, chunk=chunk, mutate=mutate,
        counters0={k: s0.counters.get(k, 0) for k in COUNTER_KEYS},
        counters1={k: s1.counters.get(k, 0) for k in COUNTER_KEYS},
        state_ts_equal=bool(s0.state_ts == s1.state_ts),
        traj_src_equal=bool(s0._traj_src == s1._traj_src),
        n_traj=(len(t0), len(t1)),
        n_bulk_chunks=int(s1.timers.counts.get("t_bulk_pack", 0)),
        max_traj_dp=max_dp,
        ate=(_ate(s0), _ate(s1)))))
