"""Where do the ~23 ms/scan of non-device time go?

Device exec is ~0.9 ms/step (profile_chain.py), so the bench's 24 ms/scan
is host+transfer+dispatch. This measures, without per-call syncs:
  1. enqueue cost of the staged scan H2D transfer (does device_put block
     the host for the full link time?)
  2. enqueue cost of the small imu_pack transfer
  3. a dispatch-only replay loop (one pre-staged scan reused) vs the full
     production loop with staging.

Run: timeout 3000 python -u scripts/profile_host_chain.py
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


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # 1) H2D enqueue cost, 320 KB int16 (the staged scan), no sync
    buf = rng.integers(-32000, 32000, size=(32768, 5)).astype(np.int16)
    xs = []
    for n in (5, 10):
        t0 = time.time()
        for _ in range(n):
            xs.append(jnp.asarray(buf))
        dt_enq = (time.time() - t0) / n * 1000
        print(f"enqueue 320KB int16 x{n}:   {dt_enq:7.2f} ms/call (no sync)",
              flush=True)
    jax.block_until_ready(xs)
    t0 = time.time()
    xs = [jnp.asarray(buf) for _ in range(10)]
    jax.block_until_ready(xs)
    print(f"enqueue+sync 320KB x10:    {(time.time()-t0)/10*1000:7.2f} "
          f"ms/call", flush=True)

    # 2) small transfer (imu_pack 257x8 f32 = 8 KB)
    small = rng.standard_normal((257, 8)).astype(np.float32)
    t0 = time.time()
    ys = [jnp.asarray(small) for _ in range(20)]
    dt = (time.time() - t0) / 20 * 1000
    jax.block_until_ready(ys)
    print(f"enqueue 8KB f32:           {dt:7.2f} ms/call (no sync)",
          flush=True)
    t0 = time.time()
    ys = [jnp.asarray(small) for _ in range(20)]
    jax.block_until_ready(ys)
    print(f"enqueue+sync 8KB x20:      {(time.time()-t0)/20*1000:7.2f} "
          f"ms/call", flush=True)

    # 3) dispatch-only vs full replay loop
    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    lm = syn.LidarModel(n_rows=128, n_cols=1024)
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)

    def make_sequencer():
        return seq.Sequencer(
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

    imu = data["imu"]
    scans = data["scans"]

    def replay(reuse_staged):
        s = make_sequencer()
        imu_i = 0

        def stage(i):
            sc = scans[i]
            return s.stage_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                                sc["valid"])

        staged_next = stage(0)
        shared = None
        n_warm = 20
        t0 = None
        for i in range(len(scans)):
            if i == n_warm:
                jax.block_until_ready(s.window.p)
                t0 = time.time()
            st = staged_next
            while imu_i < len(imu["ts"]) and \
                    imu["ts"][imu_i] <= st["t_end"] + 0.03:
                s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                          imu["gyro"][imu_i])
                imu_i += 1
            s.add_scan(st["ts_header"], staged=st)
            if i + 1 < len(scans):
                if reuse_staged:
                    # keep this scan's DEVICE arrays, re-tag with the next
                    # scan's timestamps: dispatch-identical work with ZERO
                    # new bytes on the link
                    if shared is None:
                        shared = dict(st)
                    sc = scans[i + 1]
                    t_rel = np.nan_to_num(sc["t_rel"])
                    nxt = dict(shared)
                    nxt["ts_header"] = float(sc["ts_header"])
                    nxt["t_end"] = float(sc["ts_header"] + t_rel.max())
                    staged_next = nxt
                else:
                    staged_next = stage(i + 1)
        jax.block_until_ready(s.window.p)
        return (len(scans) - n_warm) / (time.time() - t0)

    for name, reuse in (("full loop (staging new bytes)", False),
                        ("dispatch-only (reused scan buffers)", True),
                        ("full loop again", False)):
        r = replay(reuse)
        print(f"{name:38s} {r:7.1f} scans/s  ({1000/r:6.2f} ms/scan)",
              flush=True)


if __name__ == "__main__":
    main()
