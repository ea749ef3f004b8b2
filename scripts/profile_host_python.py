"""cProfile the dispatch-only replay loop: which PYTHON lines eat the
~1.4 ms/scan that bounds the bench (device exec is ~0.3 ms and fully
overlapped; staging/transfer adds only ~0.27 ms on top of this).

Run: timeout 1200 python -u scripts/profile_host_python.py
"""

import cProfile
import io
import os
import pstats
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
    imu = data["imu"]
    scans = data["scans"]

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

    def replay(profiler=None):
        s = make_sequencer()
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
                if profiler is not None:
                    profiler.enable()
                t0 = time.time()
            st = staged_next
            j = int(np.searchsorted(imu["ts"], st["t_end"] + 0.03, "right"))
            if j > imu_i:
                s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                                imu["gyro"][imu_i:j])
                imu_i = j
            s.add_scan(st["ts_header"], staged=st)
            if i + 1 < len(scans):
                staged_next = stage(i + 1)
        jax.block_until_ready(s.window.p)
        if profiler is not None:
            profiler.disable()
        return (len(scans) - n_warm) / (time.time() - t0)

    r = replay()  # warm: compiles
    print(f"warm pass: {r:.1f} scans/s", flush=True)
    prof = cProfile.Profile()
    r = replay(prof)
    print(f"profiled pass: {r:.1f} scans/s", flush=True)
    buf = io.StringIO()
    ps = pstats.Stats(prof, stream=buf).sort_stats("cumulative")
    ps.print_stats(45)
    print(buf.getvalue())


if __name__ == "__main__":
    main()
