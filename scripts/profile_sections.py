"""Per-section host timing of the bench replay loop on the real chip.

Device exec is ~0.9 ms/scan and transfers are not the bound
(profile_host_chain.py), yet the loop runs at 24 ms/scan. Wrap each
section of the per-scan host path in perf_counter to find the block.

Run: timeout 3000 python -u scripts/profile_sections.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh

acc = defaultdict(float)
cnt = defaultdict(int)


def patch(obj, name):
    fn = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        acc[name] += time.perf_counter() - t0
        cnt[name] += 1
        return out
    setattr(obj, name, wrapped)


def main():
    print("device:", jax.devices()[0], flush=True)
    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    lm = syn.LidarModel(n_rows=128, n_cols=1024)
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)

    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=lm.n_rows * lm.n_cols // 4, point_skip=4,
            n_geo_points=8192, n_map_points=16384,
            geo_leaf=0.5, map_insert_leaf=0.2,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=3,
        ),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(),
        dtype=jnp.float32)

    patch(s, "_marginalize_host")
    patch(s, "stage_scan")
    patch(s, "add_scan")
    patch(s.imu, "segment")
    patch(s.imu, "add")

    # also time the raw jit dispatch inside add_scan by wrapping the cache
    orig_get = s._get_scan_step

    def get_wrapped(*a, **k):
        jfn = orig_get(*a, **k)

        def timed(*aa, **kk):
            t0 = time.perf_counter()
            out = jfn(*aa, **kk)
            acc["scan_step_dispatch"] += time.perf_counter() - t0
            cnt["scan_step_dispatch"] += 1
            return out
        return timed
    s._get_scan_step = get_wrapped

    imu = data["imu"]
    scans = data["scans"]
    imu_i = 0

    def stage(i):
        sc = scans[i]
        return s.stage_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                            sc["valid"])

    staged_next = stage(0)
    n_warm = 20
    t0 = None
    for i in range(len(scans)):
        if i == n_warm:
            jax.block_until_ready(s.window.p)
            for k in list(acc):
                acc[k] = 0.0
                cnt[k] = 0
            t0 = time.time()
        st = staged_next
        t1 = time.perf_counter()
        while imu_i < len(imu["ts"]) and \
                imu["ts"][imu_i] <= st["t_end"] + 0.03:
            s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                      imu["gyro"][imu_i])
            imu_i += 1
        acc["imu_feed_loop"] += time.perf_counter() - t1
        s.add_scan(st["ts_header"], staged=st)
        if i + 1 < len(scans):
            staged_next = stage(i + 1)
    jax.block_until_ready(s.window.p)
    wall = time.time() - t0
    n = len(scans) - n_warm
    print(f"steady-state: {n / wall:.1f} scans/s ({wall / n * 1000:.2f} "
          f"ms/scan over {n} scans)")
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:24s} {acc[k] / n * 1000:8.2f} ms/scan "
              f"({cnt[k]} calls)")


if __name__ == "__main__":
    main()
