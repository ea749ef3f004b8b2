"""Device-time attribution for _scan_step by CHAINED dispatch.

Per-call block_until_ready on the tunneled device measures the RPC
round-trip (~25-30 ms), not the program. Here N steps are dispatched
back-to-back feeding state outputs to inputs, with ONE sync at the end:
the pipeline hides dispatch latency, so total/N ~= device execution time.
Variant configs (fewer GN iters, no map update) attribute the total.

Run: timeout 3000 python -u scripts/profile_chain.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp

import __graft_entry__ as g
from mimosa_tpu.graph import sequencer as sq


def chain_time(name, jfn, args, n=40, feed=None):
    """Dispatch n chained steps (outputs -> inputs via ``feed``), sync once."""
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    cur = list(args)
    for _ in range(n):
        out = jfn(*cur)
        cur = feed(cur, out)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:8.2f} ms/step", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    fn, args = g.entry()
    base_seq = fn.keywords["seq_cfg"]
    win_cfg = fn.keywords["win_cfg"]
    map_cfg = fn.keywords["map_cfg"]
    geo_cfg = fn.keywords["geo_cfg"]

    # outputs: (window, vmap, preints, fv, features, kf_q, kf_p, kf_count,
    #           traj_q, traj_p, debug_rec)
    # inputs:  (w, vmap, preints, fv, scan_f, pt_valid, imu_f,
    #           kf_q, kf_p, kf_count, traj_q, traj_p, debug_rec)
    def feed(cur, out):
        (w, vmap, preints, fv, _features, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    def make(seq_cfg, **kw):
        return jax.jit(functools.partial(
            sq._scan_step, seq_cfg=seq_cfg, win_cfg=win_cfg,
            map_cfg=map_cfg, geo_cfg=geo_cfg, **kw))

    full = chain_time("full step (3+1 GN, map update)",
                      make(base_seq), args, feed=feed)
    gn1 = chain_time("n_gn_iters=1 (1+1 GN)",
                     make(dataclasses.replace(base_seq, n_gn_iters=1)),
                     args, feed=feed)

    def no_map(vmap_, pts_, valid_, idx_):
        return vmap_
    nomap = chain_time("map_update = identity",
                       make(base_seq, map_update_fn=no_map), args, feed=feed)

    gn_iter = (full - gn1) / 2
    print(f"\nper-GN-iteration (linearize+build+solve): {gn_iter:6.2f} ms")
    print(f"map insert+evict+refit:                    {full-nomap:6.2f} ms")
    print(f"GN total (3 iters + final):               ~{gn_iter*4:6.2f} ms")
    print(f"everything else (decode/deskew/ds/match): ~"
          f"{full - gn_iter*4 - (full-nomap):6.2f} ms")
    print(f"device-only ceiling at full step: {1000.0/full:6.1f} scans/s")


if __name__ == "__main__":
    main()
