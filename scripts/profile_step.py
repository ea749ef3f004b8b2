"""Time the full _scan_step + _marginalize with device-resident inputs at
bench shapes, plus suspected-hot sub-pieces (sequential scans, window
assembly)."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import functools

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from mimosa_tpu.graph import sequencer as sq
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre
from mimosa_tpu.lidar import deskew as dk
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name:34s} {(time.time() - t0) / n * 1000:8.1f} ms", flush=True)
    return out


def main():
    dtype = jnp.float32
    print("device:", jax.devices()[0], flush=True)
    fn, args = g.entry()
    seq_cfg = sq.SequencerConfig(max_scan_points=32768, n_geo_points=8192,
                                 n_map_points=8192, n_gn_iters=3,
                                 max_trajectory=1024,
                                 quantize_transfer=False)
    win_cfg = win.WindowConfig(K=8)
    map_cfg = vh.VoxelMapConfig(capacity_log2=18)
    geo_cfg = geo.GeometricConfig()
    jfn = jax.jit(fn)
    timeit("FULL _scan_step (32k, 3+1 GN)", jfn, *args)

    jmarg = jax.jit(functools.partial(sq._marginalize, win_cfg=win_cfg))
    w, preints, fv = args[0], args[2], args[3]
    timeit("_marginalize", jmarg, w, preints, fv)

    # suspected hot pieces
    m = seq_cfg.max_imu_per_segment
    accs = jnp.ones((m, 3), dtype)
    gyros = jnp.zeros((m, 3), dtype)
    dts = jnp.full(m, 5e-4, dtype)
    z3 = jnp.zeros(3, dtype)
    jp = jax.jit(lambda: pre.preintegrate(accs, gyros, dts, z3, z3,
                                          1e-3, 1e-5))
    timeit(f"preintegrate scan ({m} steps)", jp)

    N = seq_cfg.max_scan_points
    pts = jnp.ones((N, 3), dtype)
    t_pts = jnp.linspace(0, 0.1, N).astype(dtype)
    imu_ts = jnp.linspace(0, 0.1, m).astype(dtype)
    q = jnp.asarray([1.0, 0, 0, 0], dtype)
    jd = jax.jit(lambda: dk.deskew(
        pts, t_pts, jnp.ones(N, bool), q, z3, z3, accs, gyros, imu_ts,
        z3, z3, jnp.asarray([0, 0, -9.81], dtype), q, z3,
        jnp.asarray(0.1, dtype)))
    timeit("deskew (32k pts, 256 ivals)", jd)

    fv8 = jnp.ones(win_cfg.K - 1, bool)
    jb = jax.jit(lambda w_: win.build_system(w_, preints, fv8, win_cfg))
    H, rhs = timeit("build_system K=8", jb, w)
    js = jax.jit(win.solve)
    timeit("solve 122", js, H, rhs)

    vmap = vh.create(map_cfg, dtype)
    jl = jax.jit(lambda p: geo.linearize(
        vmap, p, jnp.ones(8192, bool), q, z3, map_cfg, geo_cfg))
    timeit("icp linearize 8k (empty map)", jl, jnp.ones((8192, 3), dtype))

    jgn = jax.jit(lambda w_, p: _one_gn(w_, p, vmap, preints, fv8))

    def _one_gn(w_, p, vmap_, preints_, fv_):
        icp = geo.linearize(vmap_, p, jnp.ones(8192, bool), w_.q[1],
                            w_.p[1], map_cfg, geo_cfg)
        H, rhs = win.build_system(w_, preints_, fv_, win_cfg,
                                  meas=[(win.pose_idx(1), icp.H, icp.b)])
        dx = win.solve(H, rhs)
        return win.apply_update(w_, dx, win_cfg)

    timeit("one full GN iter", jgn, w, jnp.ones((8192, 3), dtype))


if __name__ == "__main__":
    main()
