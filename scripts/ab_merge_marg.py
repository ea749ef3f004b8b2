"""A/B: merge_marginalize True vs False on the real chip.

Interleaves replays of the two configs in one process (the relay's
throughput drifts between sessions; interleaving shares the drift).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

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

    def make_sequencer(merge):
        return seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                max_scan_points=lm.n_rows * lm.n_cols // 4, point_skip=4,
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=3, merge_marginalize=merge,
            ),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32,
        )

    imu = data["imu"]
    scans = data["scans"]

    def replay_once(merge):
        s = make_sequencer(merge)
        imu_i = 0

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
            while imu_i < len(imu["ts"]) and \
                    imu["ts"][imu_i] <= st["t_end"] + 0.03:
                s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                          imu["gyro"][imu_i])
                imu_i += 1
            s.add_scan(st["ts_header"], staged=st)
            if i + 1 < len(scans):
                staged_next = stage(i + 1)
        jax.block_until_ready(s.window.p)
        sps = (len(scans) - n_warm) / (time.time() - t0)
        est_ts = np.asarray([t for t, _, _ in s.trajectory])
        est_p = np.asarray([p for _, p, _ in s.trajectory])
        ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"],
                           data["gt"]["pos"])
        return sps, ate

    res = {False: [], True: []}
    ates = {False: [], True: []}
    for rep in range(4):
        for merge in (False, True):
            sps, ate = replay_once(merge)
            res[merge].append(sps)
            ates[merge].append(ate)
            print(f"rep{rep} merge={merge}: {sps:.1f} scans/s "
                  f"ate={ate:.4f}", flush=True)
    # drop rep0 (compiles)
    print(json.dumps({
        "separate_median": round(float(np.median(res[False][1:])), 2),
        "merged_median": round(float(np.median(res[True][1:])), 2),
        "separate_all": [round(r, 1) for r in res[False]],
        "merged_all": [round(r, 1) for r in res[True]],
        "ate_separate": round(float(np.max(ates[False])), 4),
        "ate_merged": round(float(np.max(ates[True])), 4),
    }))


if __name__ == "__main__":
    main()
