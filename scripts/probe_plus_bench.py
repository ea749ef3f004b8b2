"""Correlate relay mode with bench throughput in ONE process.

Probe: 40 chained _scan_step (device-resident) -> ms/step.
Then: the exact bench replay. If the probe streams (~0.2 ms) but the
replay still runs ~41 scans/s, the replay loop itself forces the slow
path; if both are fast, the historical 41 is relay-mode luck.

Run: timeout 3000 python -u scripts/probe_plus_bench.py
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
from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


def probe():
    fn, args = g.entry()
    jfn = jax.jit(fn)

    def feed(cur, out):
        (w, vmap, preints, fv, _f, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    out = jfn(*args)
    jax.block_until_ready(out)
    cur = list(args)
    t0 = time.time()
    for _ in range(40):
        out = jfn(*cur)
        cur = feed(cur, out)
    jax.block_until_ready(out)
    return (time.time() - t0) / 40 * 1000


def bench_replay():
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
            n_gn_iters=3),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(), dtype=jnp.float32)
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
    return (len(scans) - n_warm) / (time.time() - t0)


def main():
    print("device:", jax.devices()[0], flush=True)
    for rep in range(3):
        p = probe()
        print(f"probe chain: {p:7.2f} ms/step", flush=True)
        r = bench_replay()
        print(f"bench replay: {r:6.1f} scans/s", flush=True)


if __name__ == "__main__":
    main()
