"""Probe: why does bench.py's 0-GN attribution replay run ~20x slower?

Runs the same replays as bench.py but instruments per-scan wall times.
Two signatures distinguish the hypotheses:
  - uniform ~25-30 ms/scan  -> the relay session left streamed dispatch
    (an eager-op poison fired before/inside the replay);
  - a few multi-second stalls on an otherwise ~1.5 ms/scan replay ->
    late jit compiles (the n_gn_iters=0 config has its own salt, so its
    step programs compile fresh).
Order is bench.py's: 1x n=3 replay first, then the n=0 replay.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

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
    step_cache = {}

    def make_sequencer(n_gn_iters=3):
        return seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=n_gn_iters,
                max_scan_points=lm.n_rows * lm.n_cols // 4, point_skip=4,
            ),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32,
            step_cache=step_cache,
        )

    imu = data["imu"]
    scans = data["scans"]

    def replay_once(n_gn_iters, tag):
        s = make_sequencer(n_gn_iters)
        imu_i = 0
        per_scan = []

        def stage(i):
            sc = scans[i]
            return s.stage_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                                sc["valid"])

        staged_next = stage(0)
        n_warm = min(20, len(scans) // 3)
        t0 = None
        for i in range(len(scans)):
            if i == n_warm:
                jax.block_until_ready(s.window.p)
                t0 = time.time()
            st = staged_next
            tsc = time.perf_counter()
            j = int(np.searchsorted(imu["ts"], st["t_end"] + 0.03, "right"))
            if j > imu_i:
                s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                                imu["gyro"][imu_i:j])
                imu_i = j
            s.add_scan(st["ts_header"], staged=st)
            if i + 1 < len(scans):
                staged_next = stage(i + 1)
            if t0 is not None:
                per_scan.append(time.perf_counter() - tsc)
        jax.block_until_ready(s.window.p)
        rate = (len(scans) - n_warm) / (time.time() - t0)
        a = 1e3 * np.asarray(per_scan)
        print(f"[{tag}] rate={rate:.1f}/s n={len(a)} "
              f"median={np.median(a):.2f}ms p90={np.percentile(a, 90):.2f} "
              f"max={a.max():.1f} sum_top5={np.sort(a)[-5:].sum():.0f}ms",
              flush=True)
        print(f"[{tag}] top10 per-scan ms:",
              [round(float(x), 1) for x in np.sort(a)[-10:]], flush=True)
        return rate

    replay_once(3, "n3-a")
    replay_once(3, "n3-b")
    replay_once(0, "n0")
    replay_once(3, "n3-after")


if __name__ == "__main__":
    main()
