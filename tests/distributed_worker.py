"""Multi-process SPMD worker for test_distributed.py.

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
one global mesh — the CPU stand-in for a multi-host TPU pod over DCN
(SURVEY §4: multi-host tests runnable without a pod). Every process runs
the same program (multi-controller SPMD); process 0 prints checksums that
the parent compares against the single-process 8-device result.

Run: python distributed_worker.py <coordinator> <num_processes> <pid>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs():
    import numpy as np

    rng = np.random.default_rng(7)
    # three orthogonal planes of points (a corner) + pose offset
    n = 512
    pts = []
    for ax in range(3):
        p = rng.uniform(0.0, 4.0, size=(n, 3))
        p[:, ax] = 0.0
        pts.append(p)
    pts = np.concatenate(pts).astype(np.float32)
    valid = np.ones(len(pts), bool)
    q = np.asarray([0.9995, 0.02, 0.015, 0.01], np.float32)
    q /= np.linalg.norm(q)
    t = np.asarray([0.05, -0.03, 0.02], np.float32)
    g = np.asarray([0.0, 0.0, -1.0], np.float32)
    return pts, valid, q, t, g


def run(mesh_factory):
    """Insert the corner points, then linearize at the offset pose.
    Returns (H, b, num_inlier) as numpy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh
    from mimosa_tpu.parallel import sharded as sh

    pts, valid, q, t, g = build_inputs()
    map_cfg = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=12,
                                plane_min_points=5, lru_horizon=0)
    geo_cfg = geo.GeometricConfig()
    mesh = mesh_factory()
    vmap_s = sh.create_sharded_map(map_cfg, mesh)
    vmap_s = sh.sharded_insert(vmap_s, jnp.asarray(pts), jnp.asarray(valid),
                               jnp.asarray(0, jnp.int32), map_cfg, mesh)
    res = sh.sharded_linearize(vmap_s, jnp.asarray(pts), jnp.asarray(valid),
                               jnp.asarray(q), jnp.asarray(t),
                               jnp.asarray(g), map_cfg, geo_cfg, mesh)
    return (np.asarray(res.H), np.asarray(res.b),
            int(np.asarray(res.num_inlier)))


def replay_run(mesh_factory, t_total=3.6):
    """Full synthetic replay (init -> declare -> GN -> absorb -> map update
    per scan) on a mesh-sharded Sequencer. Every process executes identical
    host logic on identical (seeded) inputs — multi-controller SPMD over the
    global mesh, the determinism property of the reference's mimosa_rosbag
    (src/mimosa_rosbag.cpp:49-247) carried to a multi-host run.
    Returns (est_p [n,3], ate, n_scans)."""
    import jax.numpy as jnp
    import numpy as np

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    mesh = mesh_factory()
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=t_total)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=0)
    s = seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=max(4096, lm.n_rows * lm.n_cols),
            n_geo_points=2048, n_map_points=4096, geo_leaf=0.4,
            map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
            keyframe_rot_thresh=0.15, n_gn_iters=2,
            quantize_transfer=False),
        win_cfg=win.WindowConfig(K=6),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0),
        dtype=jnp.float32, mesh=mesh)
    imu = data["imu"]
    imu_i = 0
    for scan in data["scans"]:
        t_end = scan["ts_header"] + scan["t_rel"].max()
        while imu_i < len(imu["ts"]) and imu["ts"][imu_i] <= t_end + 0.03:
            s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                      imu["gyro"][imu_i])
            imu_i += 1
        s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                   scan["valid"])
    est_ts = np.asarray([t for t, _, _ in s.trajectory])
    est_p = np.asarray([p for _, p, _ in s.trajectory])
    ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"], data["gt"]["pos"])
    return est_p, float(ate), len(data["scans"])


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "kernel"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from mimosa_tpu.parallel import sharded as sh

    if mode == "replay":
        import json
        est_p, ate, n_scans = replay_run(lambda: sh.make_mesh())
        if pid == 0:
            print("DIST_TRAJ", json.dumps(dict(
                p=[[round(float(x), 6) for x in row] for row in est_p],
                ate=round(ate, 6), n_scans=n_scans)))
    else:
        H, b, n_inl = run(lambda: sh.make_mesh())
        if pid == 0:
            print("DIST_RESULT",
                  repr([round(float(x), 4) for x in H.ravel().tolist()]),
                  repr([round(float(x), 4) for x in b.tolist()]), n_inl)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
