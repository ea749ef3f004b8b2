"""Bisect the mid-session streamed-dispatch loss seen in
probe_range_transfer: after the first 3-replay group, ANY later streaming
group pins at ~41 scans/s (the per-program round-trip signature),
regardless of transfer codec. Candidate triggers, tested in order:

  A  rt=0 x3          (baseline group, shared salt)
  B  rt=0 x2          same salt again, NO trajectory/ate call yet
  C  rt=0' x2         new salt (kf thresh epsilon), still no ate
  D  ate(A's seq)     then rt=0 x2 — trajectory fetch + numpy metric

Whichever phase first drops to ~41 identifies the trigger.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from mimosa_tpu.graph import sequencer as seq  # noqa: E402
from mimosa_tpu.graph import window as win  # noqa: E402
from mimosa_tpu.io import synthetic as syn  # noqa: E402
from mimosa_tpu.lidar import geometric as geo  # noqa: E402
from mimosa_tpu.mapping import voxel_hash as vh  # noqa: E402

world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                          center=(12.0, 8.0, 2.0))
lm = syn.LidarModel(n_rows=128, n_cols=1024)
data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01, range_noise=0.01)
scans = data["scans"]
imu = data["imu"]
step_cache = {}


def make_sequencer(kf=0.3):
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            n_geo_points=8192, n_map_points=16384,
            geo_leaf=0.5, map_insert_leaf=0.2,
            keyframe_trans_thresh=kf, keyframe_rot_thresh=0.15,
            n_gn_iters=3, max_scan_points=lm.n_rows * lm.n_cols // 4,
            point_skip=4),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(), dtype=jnp.float32,
        step_cache=step_cache)


def replay(kf=0.3):
    s = make_sequencer(kf)
    imu_i = 0
    n_warm = 20
    t0 = None
    staged = s.stage_scan(scans[0]["ts_header"], scans[0]["points"],
                          scans[0]["t_rel"], scans[0]["valid"])
    for i in range(len(scans)):
        if i == n_warm:
            jax.block_until_ready(s.window.p)
            t0 = time.time()
        st = staged
        j = int(np.searchsorted(imu["ts"], st["t_end"] + 0.03, "right"))
        if j > imu_i:
            s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                            imu["gyro"][imu_i:j])
            imu_i = j
        s.add_scan(st["ts_header"], staged=st)
        if i + 1 < len(scans):
            sc = scans[i + 1]
            staged = s.stage_scan(sc["ts_header"], sc["points"],
                                  sc["t_rel"], sc["valid"])
    jax.block_until_ready(s.window.p)
    return (len(scans) - n_warm) / (time.time() - t0), s


def group(tag, n, kf=0.3):
    rates, s = [], None
    for _ in range(n):
        r, s = replay(kf)
        rates.append(round(r, 1))
    print(f"{tag}: {rates}", flush=True)
    return s


sA = group("A rt0 x3 (baseline)   ", 3)
group("B rt0 x2 (same salt)  ", 2)
group("C rt0' x2 (new salt)  ", 2, kf=0.3001)
ts = np.asarray([t for t, _, _ in sA.trajectory])
p = np.asarray([p for _, p, _ in sA.trajectory])
print("ate(A) =", syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"]))
group("D rt0 x2 (post-ate)   ", 2)
