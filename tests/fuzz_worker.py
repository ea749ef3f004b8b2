"""Subprocess worker for the multimodal bulk fuzz (test_bulk_fuzz.py).

Runs a contiguous range of fuzz seeds in a FRESH process and prints one
JSON line with per-seed results. Why a subprocess: one process
accumulating every fuzz program variant (the multimodal lax.scan/switch
body per chunk shape per config salt) exhausts LLVM's JIT code-memory
reservation on CPU — observed as "LLVM compilation error: Cannot
allocate memory" floods followed by deterministic segfaults in
libgcc_s unwinding (dmesg), far below actual RAM limits. Batching seeds
across processes bounds the live program count.

Usage: python tests/fuzz_worker.py SEED_LO SEED_HI
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

    import test_bulk_fuzz as tf
    from mimosa_tpu.io import synthetic as syn

    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=3.5)
    lm = syn.LidarModel(n_rows=8, n_cols=128)
    data = syn.generate(world, tc, lm, seed=0)
    traj = syn.make_trajectory(tc)
    base = (data, traj, tc)

    out = []
    for sd in range(lo, hi):
        msgs, cfg_kw, chunk = tf._fuzz_stream(base, sd)
        s0 = tf._replay(base, msgs, cfg_kw, chunk, bulk=False)
        s1 = tf._replay(base, msgs, cfg_kw, chunk, bulk=True)
        t0, t1 = s0.trajectory, s1.trajectory
        max_dp = max((float(np.linalg.norm(np.asarray(p0) - np.asarray(p1)))
                      for (_, p0, _), (_, p1, _) in zip(t0, t1)),
                     default=0.0)

        def _ate(s_):
            rows = [(t, p) for (t, p, _), src in zip(s_.trajectory,
                                                     s_._traj_src)
                    if src >= 0]
            if len(rows) < 3:
                return float("nan")
            ts = np.asarray([t for t, _ in rows])
            p = np.asarray([pp for _, pp in rows])
            return syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"])
        out.append(dict(
            seed=sd, cfg=cfg_kw, chunk=chunk,
            counters0={k: s0.counters.get(k, 0) for k in tf.COUNTER_KEYS},
            counters1={k: s1.counters.get(k, 0) for k in tf.COUNTER_KEYS},
            state_ts_equal=bool(s0.state_ts == s1.state_ts),
            traj_ts_equal=bool(s0._traj_ts == s1._traj_ts),
            traj_src_equal=bool(s0._traj_src == s1._traj_src),
            n_traj=(len(t0), len(t1)),
            max_traj_dp=max_dp,
            ate=(_ate(s0), _ate(s1)),
            mm_chunk_ran=bool(any(isinstance(k, tuple) and "bulkmm" in str(k)
                                  for k in s1._step_cache)),
        ))
    print("FUZZRESULT " + json.dumps(out))
