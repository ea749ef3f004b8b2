"""Per-stage TPU timing of the scan pipeline at bench shapes.

Run: timeout 3000 python -u scripts/profile_tpu.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np

import mimosa_tpu  # noqa: F401  (sets matmul precision)
from mimosa_tpu.core import lie
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre
from mimosa_tpu.lidar import deskew as dk
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.lidar.downsample import voxel_downsample
from mimosa_tpu.mapping import voxel_hash as vh


def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:36s} {dt:9.1f} ms")
    return out


def main():
    dtype = jnp.float32
    N = 131072
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-20, 20, size=(N, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    valid = jnp.ones(N, bool)

    print(f"device: {jax.devices()[0]}")

    # host -> device transfer
    t0 = time.time()
    for _ in range(5):
        x = jax.device_put(pts_np)
        jax.block_until_ready(x)
    print(f"{'h2d transfer 131k pts':36s} {(time.time()-t0)/5*1000:9.1f} ms")

    map_cfg = vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                plane_min_points=5, lru_horizon=0)
    geo_cfg = geo.GeometricConfig()

    # downsample
    ds_geo = jax.jit(lambda p, v: voxel_downsample(p, v, 0.5, 8192))
    ds_map = jax.jit(lambda p, v: voxel_downsample(p, v, 0.2, 16384))
    out = timeit("voxel_downsample geo (131k->8k)", ds_geo, pts, valid)
    pts_geo, geo_valid, _ = out
    timeit("voxel_downsample map (131k->16k)", ds_map, pts, valid)

    # map ops
    m = vh.create(map_cfg)
    ins = jax.jit(lambda m, p, v: vh.insert(m, p, v, 0, map_cfg),
                  donate_argnums=0)
    upd = jax.jit(lambda m: vh.update_planes(m, map_cfg), donate_argnums=0)
    mp_pts, mp_valid, _ = ds_map(pts, valid)
    m = timeit("voxel insert 16k pts", ins, m, mp_pts, mp_valid, n=3)
    m = timeit("update_planes (2^19)", upd, m, n=3)

    # query + linearize
    q = lie.quat_identity(dtype)
    t = jnp.zeros(3, dtype)
    qp = jax.jit(lambda m, p: vh.query_planes(m, p, map_cfg))
    timeit("query_planes 8k (stencil 7)", qp, m, pts_geo)
    lin = jax.jit(lambda m, p, v, q, t: geo.linearize(
        m, p, v, q, t, map_cfg, geo_cfg))
    timeit("icp linearize 8k", lin, m, pts_geo, geo_valid, q, t)

    # deskew
    M = 256
    accs = jnp.tile(jnp.asarray([[0.0, 0, 9.81]], dtype), (M, 1))
    gyros = jnp.zeros((M, 3), dtype)
    imu_ts = jnp.linspace(0.0, 0.1, M).astype(dtype)
    t_pts = jnp.asarray(rng.uniform(0, 0.1, N), dtype)
    dsk = jax.jit(lambda: dk.deskew(
        pts, t_pts, valid, q, t, jnp.zeros(3, dtype), accs, gyros, imu_ts,
        jnp.zeros(3, dtype), jnp.zeros(3, dtype),
        jnp.asarray([0, 0, -9.81], dtype), q, t, jnp.asarray(0.1, dtype)))
    timeit("deskew 131k", dsk)

    # preintegration scan
    pint = jax.jit(lambda: pre.preintegrate(
        accs, gyros, jnp.full(M, 5e-4, dtype), jnp.zeros(3, dtype),
        jnp.zeros(3, dtype), 1e-3, 1e-5))
    timeit("preintegrate 256", pint)

    # window ops
    wcfg = win.WindowConfig(K=8)
    w = win.create(wcfg)
    w = win.append_state(w, q, t, jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                         jnp.zeros(3, dtype), 0.0)
    w = win.init_priors(w, wcfg)
    preints = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[pre.init_preint(jnp.zeros(3, dtype), jnp.zeros(3, dtype))
          for _ in range(wcfg.K - 1)])
    fv = jnp.zeros(wcfg.K - 1, bool)
    bs = jax.jit(lambda w: win.build_system(w, preints, fv, wcfg))
    H, rhs = timeit("build_system K=8", bs, w)
    sv = jax.jit(win.solve)
    timeit("solve 122x122", sv, H, rhs)
    mg = jax.jit(lambda w: win.marginalize_oldest(w, preints, wcfg))
    timeit("marginalize", mg, w, n=3)


if __name__ == "__main__":
    main()
