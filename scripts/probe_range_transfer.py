"""TPU probe: xyz-int16 vs sensor-native range-image transfer throughput.

Measures streaming and bulk replay rates for both transfer codecs on the
bench shapes (128x1024, point_skip 4, K=8). The tunnel's H2D bandwidth
bounds offline bulk replay; range mode ships 4 B/pt vs 8 (geo path).
Compare IN-SESSION only (relay sessions swing +-30%).
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


def make_sequencer(range_transfer=False):
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            n_geo_points=8192, n_map_points=16384,
            geo_leaf=0.5, map_insert_leaf=0.2,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=3, max_scan_points=lm.n_rows * lm.n_cols // 4,
            point_skip=4, range_transfer=range_transfer),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(), dtype=jnp.float32,
        step_cache=step_cache,
        ray_dirs=syn.beam_dirs(lm)[0] if range_transfer else None)


def replay_streaming(rt):
    s = make_sequencer(rt)
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
    rate = (len(scans) - n_warm) / (time.time() - t0)
    return rate, s


def replay_bulk(rt):
    s = make_sequencer(rt)
    s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
    n_warm = 20
    for i in range(n_warm):
        sc = scans[i]
        s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"], sc["valid"])
    jax.block_until_ready(s.window.p)
    t0 = time.time()
    s.add_scans_bulk(scans[n_warm:], chunk=32)
    jax.block_until_ready(s.window.p)
    return (len(scans) - n_warm) / (time.time() - t0), s


def ate(s):
    ts = np.asarray([t for t, _, _ in s.trajectory])
    p = np.asarray([p for _, p, _ in s.trajectory])
    return syn.ate_rmse(ts, p, data["gt"]["ts"], data["gt"]["pos"])


ORDER = (("stream", True), ("stream", False), ("bulk", True),
         ("bulk", False)) if "--rt-first" in sys.argv else \
        (("stream", False), ("stream", True), ("bulk", False),
         ("bulk", True))
for mode, rt in ORDER:
    fn = replay_streaming if mode == "stream" else replay_bulk
    if True:
        rates = []
        s = None
        for _ in range(3):
            r, s = fn(rt)
            rates.append(r)
        print(f"{mode:7s} rt={int(rt)}  median {np.median(rates):7.1f} "
              f"scans/s  runs {[round(r, 1) for r in rates]}  "
              f"ate {ate(s)*1e3:.1f} mm", flush=True)
