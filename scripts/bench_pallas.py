"""Compare the Pallas fused ICP kernel vs the XLA implementation on the
real TPU at production shapes. Run: python scripts/bench_pallas.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh
from mimosa_tpu.ops import icp_pallas as ip


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:34s} {dt:8.3f} ms", flush=True)
    return out, dt


def main():
    N = 8192
    map_cfg = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=17,
                                plane_min_points=5)
    cfg = geo.GeometricConfig(loc_count_thresh=50.0)
    rng = np.random.default_rng(0)
    world = []
    for axis, val in [(2, 0.0), (2, 3.0), (0, 0.0), (0, 4.0), (1, 0.0)]:
        p = rng.uniform(0.2, 3.8, size=(30000, 3))
        p[:, axis] = val + rng.normal(size=30000) * 0.003
        world.append(p)
    world = np.concatenate(world).astype(np.float32)
    m = vh.create(map_cfg)
    m = vh.insert(m, jnp.asarray(world), jnp.ones(len(world), bool), 0,
                  map_cfg)
    m = vh.update_planes(m, map_cfg)
    q = lie.exp_so3(jnp.asarray([0.05, -0.1, 0.4], jnp.float32))
    t = jnp.asarray([2.0, 1.5, 1.2], jnp.float32)
    idx = rng.choice(len(world), N, replace=False)
    qi, ti = lie.se3_inverse(q, t)
    pts = lie.se3_transform(qi, ti, jnp.asarray(world[idx])).astype(
        jnp.float32)
    valid = jnp.ones(N, bool)

    jmatch = jax.jit(lambda m, p: geo.match(m, p, q, t, map_cfg))
    matches, t_match = timeit("match (query_planes)", jmatch, m, pts)

    jxla = jax.jit(lambda ma, p: geo.linearize_with(ma, p, valid, q, t, cfg))
    ref, t_xla = timeit("linearize_with (XLA)", jxla, matches, pts)

    jpl = jax.jit(lambda ma, p: ip.linearize_pallas(ma, p, valid, q, t, cfg))
    out, t_pl = timeit("linearize_pallas", jpl, matches, pts)

    print(f"H rel err: "
          f"{float(jnp.max(jnp.abs(out.H - ref.H)) / jnp.max(jnp.abs(ref.H))):.2e}"
          f"  inliers {int(out.num_inlier)} vs {int(ref.num_inlier)}")
    print(f"speedup pallas vs xla: {t_xla / t_pl:.2f}x")


if __name__ == "__main__":
    main()
