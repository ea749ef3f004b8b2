"""Does executing the marginalize program slow every LATER dispatch?

scan chain (1) -> marginalize warmup -> scan chain (2) -> chain with
marg+scan per step (3) -> scan chain (4). If (2+) are ~24 ms/step while
(1) is ~0.1, the marginalize executable poisons the session's streaming.

Run: timeout 3000 python -u scripts/profile_poison.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import __graft_entry__ as g
from mimosa_tpu.graph import sequencer as sq


def main():
    print("device:", jax.devices()[0], flush=True)
    fn, args = g.entry()
    jfn = jax.jit(fn)
    win_cfg = fn.keywords["win_cfg"]
    jmarg = jax.jit(functools.partial(sq._marginalize, win_cfg=win_cfg))

    def feed(cur, out):
        (w, vmap, preints, fv, _features, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    def scan_chain(name, n=40, with_marg=False):
        cur = list(args)
        out = jfn(*cur)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            if with_marg:
                w2, p2, f2 = jmarg(cur[0], cur[2], cur[3])
                cur[0], cur[2], cur[3] = w2, p2, f2
            out = jfn(*cur)
            cur = feed(cur, out)
        jax.block_until_ready(out)
        print(f"{name:46s} {(time.time()-t0)/n*1000:8.2f} ms/step",
              flush=True)

    scan_chain("1 scan chain BEFORE any marginalize")
    t0 = time.time()
    jax.block_until_ready(jmarg(args[0], args[2], args[3]))
    print(f"marginalize warmup (compile+exec): {time.time()-t0:.2f} s",
          flush=True)
    scan_chain("2 scan chain AFTER marginalize warmup")
    scan_chain("3 marg+scan per step", with_marg=True)
    scan_chain("4 scan chain after that")


if __name__ == "__main__":
    main()
