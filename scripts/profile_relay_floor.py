"""What is the relay's per-program floor, and does it pipeline?

1. trivial chained program (x+1 on [8]) x200: per-step cost of a
   dependent chain = dispatch floor.
2. trivial chained program on a LARGE buffer (map-sized, 2^19 rows).
3. _scan_step chained x40, twice (same process) — is the earlier
   0.89 ms/step reproducible, or was it a fluke of that session?

Run: timeout 3000 python -u scripts/profile_relay_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g


def chain(name, jfn, x0, n):
    x = jfn(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(n):
        x = jfn(x)
    jax.block_until_ready(x)
    print(f"{name:48s} {(time.time()-t0)/n*1000:8.3f} ms/step", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)

    tiny = jax.jit(lambda x: x + 1.0)
    chain("tiny x+1 [8] chained x200", tiny, jnp.zeros(8), 200)
    chain("tiny x+1 [8] chained x200 (again)", tiny, jnp.zeros(8), 200)

    big = jax.jit(lambda x: x + 1.0)
    chain("x+1 [2^19,8] chained x50", big,
          jnp.zeros((1 << 19, 8)), 50)

    fn, args = g.entry()
    jfn = jax.jit(fn)

    def feed(cur, out):
        (w, vmap, preints, fv, _features, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    for rep in range(2):
        out = jfn(*args)
        jax.block_until_ready(out)
        cur = list(args)
        t0 = time.time()
        for _ in range(40):
            out = jfn(*cur)
            cur = feed(cur, out)
        jax.block_until_ready(out)
        print(f"scan_step chained x40 (rep {rep})            "
              f"     {(time.time()-t0)/40*1000:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
