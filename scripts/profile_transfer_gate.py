"""Does a fresh H2D transfer gating each dispatch kill relay pipelining?

A: chained _scan_step, all inputs device-resident        (known ~0.9 ms)
B: same, but imu_f re-uploaded from numpy EACH step
C: B plus a 256 KB int16 scan upload each step
D: all imu_f uploads issued FIRST, then the chain consumes them
E: two dispatches per step (marginalize-style extra program), no uploads

Run: timeout 3000 python -u scripts/profile_transfer_gate.py
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
import numpy as np

import __graft_entry__ as g
from mimosa_tpu.graph import sequencer as sq
from mimosa_tpu.graph import window as win


def main():
    print("device:", jax.devices()[0], flush=True)
    fn, args = g.entry()
    jfn = jax.jit(fn)
    win_cfg = fn.keywords["win_cfg"]
    jmarg = jax.jit(functools.partial(sq._marginalize, win_cfg=win_cfg))

    imu_np = np.asarray(args[6], np.float32)
    scan_np = np.asarray(args[4])

    def feed(cur, out):
        (w, vmap, preints, fv, _features, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    N = 40
    out = jfn(*args)
    jax.block_until_ready(out)
    jax.block_until_ready(jmarg(args[0], args[2], args[3]))

    def run(name, body):
        cur = list(args)
        t0 = time.time()
        o = None
        for i in range(N):
            o, cur = body(i, cur)
        jax.block_until_ready(o)
        print(f"{name:52s} {(time.time()-t0)/N*1000:8.2f} ms/step",
              flush=True)

    def body_a(i, cur):
        o = jfn(*cur)
        return o, feed(cur, o)
    run("A chained, device-resident inputs", body_a)

    def body_b(i, cur):
        cur = list(cur)
        cur[6] = jnp.asarray(imu_np + np.float32(i * 1e-6))
        o = jfn(*cur)
        return o, feed(cur, o)
    run("B fresh 8KB imu upload gates each dispatch", body_b)

    def body_c(i, cur):
        cur = list(cur)
        cur[4] = jnp.asarray(scan_np)
        cur[6] = jnp.asarray(imu_np + np.float32(i * 1e-6))
        o = jfn(*cur)
        return o, feed(cur, o)
    run("C fresh 8KB imu + 256KB scan each step", body_c)

    pre_up = [jnp.asarray(imu_np + np.float32(i * 1e-6)) for i in range(N)]
    jax.block_until_ready(pre_up)

    def body_d(i, cur):
        cur = list(cur)
        cur[6] = pre_up[i]
        o = jfn(*cur)
        return o, feed(cur, o)
    run("D pre-uploaded imu (device-resident)", body_d)

    def body_e(i, cur):
        cur = list(cur)
        w2, p2, f2 = jmarg(cur[0], cur[2], cur[3])
        cur[0], cur[2], cur[3] = w2, p2, f2
        o = jfn(*cur)
        return o, feed(cur, o)
    run("E marginalize + scan dispatch per step, no uploads", body_e)

    def body_f(i, cur):
        cur = list(cur)
        w2, p2, f2 = jmarg(cur[0], cur[2], cur[3])
        cur[0], cur[2], cur[3] = w2, p2, f2
        cur[4] = jnp.asarray(scan_np)
        cur[6] = jnp.asarray(imu_np + np.float32(i * 1e-6))
        o = jfn(*cur)
        return o, feed(cur, o)
    run("F full production shape: 2 dispatch + 2 uploads", body_f)


if __name__ == "__main__":
    main()
