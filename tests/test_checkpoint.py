"""Checkpoint/resume: a replay split across a save/load must produce the
same trajectory as an uninterrupted one."""

import numpy as np

from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.utils import checkpoint as ckpt


def build_seq():
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    lm = syn.LidarModel()
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=lm.n_rows * lm.n_cols, n_geo_points=4096,
            n_map_points=8192, geo_leaf=0.4, map_insert_leaf=0.15,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=2),
        win_cfg=win.WindowConfig(K=5),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(loc_count_thresh=50.0),
        dtype=jnp.float32), lm


def test_checkpoint_roundtrip(tmp_path):
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.5)
    data = None

    def feed(s, lm, scans, imu, start_ii):
        ii = start_ii
        for scan in scans:
            t_end = scan["ts_header"] + scan["t_rel"].max()
            while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
                s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
                ii += 1
            s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                       scan["valid"])
        return ii

    s1, lm = build_seq()
    data = syn.generate(world, tc, lm, seed=0)
    scans = data["scans"]
    half = len(scans) // 2

    # uninterrupted run
    feed(s1, lm, scans, data["imu"], 0)
    ref_traj = np.asarray([p for _, p, _ in s1.trajectory])

    # interrupted run with save/load in the middle
    s2, _ = build_seq()
    ii = feed(s2, lm, scans[:half], data["imu"], 0)
    path = tmp_path / "ckpt.npz"
    ckpt.save(s2, path)

    s3, _ = build_seq()
    ckpt.load(s3, path)
    assert s3.initialized
    assert s3.scan_idx == s2.scan_idx
    feed(s3, lm, scans[half:], data["imu"], ii)
    traj = np.asarray([p for _, p, _ in s3.trajectory])

    assert traj.shape == ref_traj.shape
    np.testing.assert_allclose(traj, ref_traj, atol=1e-5)
