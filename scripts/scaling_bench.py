"""Mesh-scaling benchmark of the sharded ICP linearization.

Measures the sharded correspondence+linearize kernel (points over 'dp',
map voxel blocks over 'mp') at increasing device counts and reports
scaling efficiency — the BASELINE.md ">= 0.8 efficiency at >= 2 hosts"
metric.

CAVEAT on this dev machine: only VIRTUAL CPU devices exist
(xla_force_host_platform_device_count), which timeshare the same physical
cores — the efficiency numbers are lower bounds that mostly validate
CORRECTNESS of the sharded path, not real scaling. On a pod slice the same
script runs over real chips with collectives on ICI and measures true
efficiency. When the map fits one chip's HBM, prefer n_mp=1 (map
replicated): the mp cross-shard plane combine costs per-point psums.

Usage: python scripts/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # force a virtual CPU mesh: the container sitecustomize pins
    # jax_platforms to the (single) tunneled TPU otherwise
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mimosa_tpu.core import lie
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh
    from mimosa_tpu.parallel import sharded as par

    n_dev = len(jax.devices())
    N = 65536                     # points per linearize
    map_cfg = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                plane_min_points=5)
    geo_cfg = geo.GeometricConfig(loc_count_thresh=50.0)

    rng = np.random.default_rng(0)
    world = []
    for axis, val in [(2, 0.0), (2, 3.0), (0, 0.0), (0, 30.0), (1, 0.0),
                      (1, 20.0)]:
        p = rng.uniform(0.2, 20.0, size=(60000, 3))
        p[:, 2] = np.clip(p[:, 2], 0.2, 2.8)
        p[:, axis] = val + rng.normal(size=60000) * 0.003
        world.append(p)
    world = np.concatenate(world).astype(np.float32)
    idx = rng.choice(len(world), N, replace=False)
    q = lie.exp_so3(jnp.asarray([0.02, -0.03, 0.4], jnp.float32))
    t = jnp.asarray([10.0, 5.0, 1.4], jnp.float32)
    qi, ti = lie.se3_inverse(q, t)
    pts_b = lie.se3_transform(qi, ti, jnp.asarray(world[idx])).astype(
        jnp.float32)
    valid = jnp.ones(N, bool)
    g = jnp.asarray([0, 0, -1.0], jnp.float32)

    results = {}
    base = None
    for n in [1, 2, 4, 8]:
        if n > n_dev:
            break
        mesh = par.make_mesh(n, n_mp=2 if n >= 4 else 1)
        ms = par.create_sharded_map(map_cfg, mesh)
        ms = par.sharded_insert(ms, jnp.asarray(world),
                                jnp.ones(len(world), bool),
                                jnp.asarray(0, jnp.int32), map_cfg, mesh)
        f = jax.jit(lambda m, p: par.sharded_linearize(
            m, p, valid, q, t, g, map_cfg, geo_cfg, mesh))
        out = f(ms, pts_b)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = f(ms, pts_b)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1000
        thr = N / dt * 1000 / 1e6
        if base is None:
            base = dt
        eff = base / dt / n
        results[n] = dict(ms=round(dt, 2), mpts_s=round(thr, 2),
                          speedup=round(base / dt, 2),
                          efficiency=round(eff, 3),
                          inliers=int(out.num_inlier))
        print(f"devices={n:2d} mesh=({mesh.shape['dp']}x{mesh.shape['mp']}) "
              f"{dt:7.2f} ms  {thr:6.2f} Mpts/s  speedup {base / dt:5.2f}  "
              f"eff {eff:5.2f}", flush=True)
    print(json.dumps({"metric": "sharded_icp_scaling", "results": results}))

    # --- wp axis: distributed Schur-complement batch window adjustment ---
    # (parallel/window_shard.py — keyframes sharded, one psum per GN round;
    # same virtual-device caveat as above: correctness + lower-bound only)
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.imu import preintegration as pre
    from mimosa_tpu.parallel import window_shard as ws

    K = 64
    cfg = win.WindowConfig(K=K, damping=1e-6)
    dtype = jnp.float32
    rngw = np.random.default_rng(1)
    qs = jnp.tile(lie.quat_identity(dtype), (K, 1))
    ps = jnp.asarray(np.cumsum(rngw.normal(size=(K, 3)) * 0.1, 0), dtype)
    vs = jnp.zeros((K, 3), dtype)
    bgs = jnp.zeros((K, 3), dtype)
    bas = jnp.zeros((K, 3), dtype)
    gd = jnp.asarray([0.0, 0.0, -1.0], dtype)
    M = 20
    accs = jnp.asarray(
        np.tile([[0.0, 0.0, 9.81]], (M, 1))
        + rngw.normal(size=(M, 3)) * 0.01, dtype)
    seg = pre.preintegrate(accs, jnp.zeros((M, 3), dtype),
                           jnp.full(M, 0.005, dtype),
                           jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                           1e-4, 1e-5)
    preints = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (K - 1,) + a.shape), seg)
    fv = jnp.ones(K - 1, bool)
    A = rngw.normal(size=(K, win.SD, win.SD))
    mH = jnp.asarray(np.einsum("kij,kil->kjl", A, A), dtype)
    mb = jnp.asarray(rngw.normal(size=(K, win.SD)), dtype)

    results_w = {}
    base = None
    for n in [1, 2, 4, 8]:
        if n > n_dev or K // n < 2:
            break
        mesh = ws.make_wp_mesh(n)
        prior = ws.anchor_prior(qs, ps, vs, bgs, bas, gd,
                                (qs[0], ps[0], vs[0], bgs[0], bas[0], gd),
                                cfg)
        f = jax.jit(lambda mh, mb_: ws.distributed_gn_step(
            mesh, qs, ps, vs, bgs, bas, gd, preints, fv, mh, mb_, cfg,
            prior))
        out = f(mH, mb)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = f(mH, mb)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1000
        if base is None:
            base = dt
        eff = base / dt / n
        results_w[n] = dict(ms=round(dt, 2),
                            speedup=round(base / dt, 2),
                            efficiency=round(eff, 3))
        print(f"wp devices={n:2d} K={K}  {dt:7.2f} ms/GN-step  "
              f"speedup {base / dt:5.2f}  eff {eff:5.2f}", flush=True)
    print(json.dumps({"metric": "window_shard_scaling",
                      "K": K, "results": results_w}))

    # --- full-replay scans/s vs devices (Sequencer(mesh=...)) ---
    # The end-to-end figure VERDICT r1 asked for. Same caveat, stronger:
    # virtual CPU devices TIMESHARE physical cores AND the per-scan host
    # loop is serial, so the numbers below are a correctness demonstration
    # of the whole multi-chip replay path at several mesh shapes, not a
    # scaling measurement (that needs a pod slice).
    from mimosa_tpu.graph import sequencer as sq
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.mapping import voxel_hash as vh2

    data = syn.generate(syn.room_world(),
                        syn.TrajectoryConfig(t_total=4.0),
                        syn.LidarModel(), seed=0)
    imu = data["imu"]
    results_r = {}
    for n in [1, 2, 4, 8]:
        if n > n_dev:
            break
        mesh = par.make_mesh(n, n_mp=2 if n >= 4 else 1)
        s = sq.Sequencer(
            mesh=mesh,
            seq_cfg=sq.SequencerConfig(
                max_scan_points=8192, n_geo_points=4096, n_map_points=8192,
                geo_leaf=0.4, map_insert_leaf=0.15, n_gn_iters=2),
            win_cfg=win.WindowConfig(K=6),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                                      plane_min_points=5))
        imu_i = 0
        t0 = time.time()
        n_scans = 0
        for scan in data["scans"]:
            t_end = scan["ts_header"] + scan["t_rel"].max()
            while imu_i < len(imu["ts"]) and imu["ts"][imu_i] <= t_end + 0.03:
                s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                          imu["gyro"][imu_i])
                imu_i += 1
            s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                       scan["valid"])
            n_scans += 1
        imu_i = 0
        dt = time.time() - t0
        est = np.asarray([p for _, p, _ in s.trajectory])
        ets = np.asarray([t for t, _, _ in s.trajectory])
        ate = syn.ate_rmse(ets, est, data["gt"]["ts"], data["gt"]["pos"])
        results_r[n] = dict(scans_per_s=round(n_scans / dt, 2),
                            ate_m=round(float(ate), 4))
        print(f"replay devices={n:2d} mesh=({mesh.shape['dp']}x"
              f"{mesh.shape['mp']})  {n_scans / dt:6.2f} scans/s  "
              f"ATE {ate:.4f} m", flush=True)
    print(json.dumps({"metric": "replay_scaling_correctness",
                      "note": "virtual CPU devices timeshare cores — "
                              "correctness only", "results": results_r}))


if __name__ == "__main__":
    main()
