"""Bisect INSIDE the end-of-replay fetch (probe_poison2 found phase D —
the trajectory/ate read — pins later replays at 41 scans/s even via a
jitted-identity + device_get). Sub-steps, each followed by one replay:

  A x2   baseline
  B      jax.block_until_ready(traj_q)
  C      device_get of a SCALAR (kf_count) via jit identity
  D      device_get of the 1 MB traj_q ring via jit identity
  E      the full trajectory property + ate math

First step whose following replay drops to ~41 is the trigger.
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


def make_sequencer():
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            n_geo_points=8192, n_map_points=16384,
            geo_leaf=0.5, map_insert_leaf=0.2,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=3, max_scan_points=lm.n_rows * lm.n_cols // 4,
            point_skip=4),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(), dtype=jnp.float32,
        step_cache=step_cache)


def replay():
    s = make_sequencer()
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


def step(tag, fn=None):
    if fn is not None:
        fn()
    r, s = replay()
    print(f"{tag}: {r:7.1f} scans/s", flush=True)
    return s


s0 = step("A1 baseline")
s0 = step("A2 baseline")
step("B  post block_until_ready",
     lambda: jax.block_until_ready(s0.traj_q))
step("C  post scalar fetch",
     lambda: seq._host_fetch(s0.kf_count))
step("D  post 1MB traj fetch",
     lambda: seq._host_fetch(s0.traj_q))


def full_ate():
    ts = np.asarray([t for t, _, _ in s0.trajectory])
    p = np.asarray([p for _, p, _ in s0.trajectory])
    syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"])


step("E  post full ate", full_ate)
