"""Synthetic end-to-end replay: the CI-runnable integration test.

``python -m mimosa_tpu.io.synthetic_replay [--platform cpu]`` generates a
synthetic LiDAR+IMU sequence, replays it through the full Sequencer
pipeline, and prints one line with the ATE — the stand-in for the
reference's ``mimosa_rosbag`` + evo evaluation loop
(ref src/mimosa_rosbag.cpp, scripts/dataset_evaluation.py).
"""

from __future__ import annotations

import time


def run(platform=None, dtype="float32", t_total=12.0, verbose=True,
        seed=0, imu_noise=0.0, range_noise=0.0, n_gn_iters=3,
        use_photometric=False, world=None, tc=None,
        project_on_degeneracy=False, use_4dof=False,
        project_degenerate=False, two_pass=False, smooth=False,
        range_transfer=False, step_cache=None):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    world = world if world is not None else syn.room_world()
    tc = tc if tc is not None else syn.TrajectoryConfig(t_total=t_total)
    lm = syn.LidarModel()
    data = syn.generate(world, tc, lm, seed=seed, imu_noise=imu_noise,
                        range_noise=range_noise)

    photo_cfg = None
    if use_photometric:
        from mimosa_tpu.lidar import photometric as ph
        photo_cfg = ph.PhotometricConfig(
            rows=lm.n_rows, cols=lm.n_cols, fov_up=lm.fov_up,
            fov_down=lm.fov_down, range_min=0.5, range_max=40.0,
            gradient_threshold=2.0, nma_radius=5, num_features=48,
            margin=3, intensity_scale=1.0, filter_brightness=False,
            remove_lines=False,
            project_on_degeneracy=project_on_degeneracy)

    n_scan_pts = lm.n_rows * lm.n_cols

    # step_cache: pass ONE dict across repeated run() calls (test
    # modules, the accuracy scoreboard) to share compiled step programs
    # between same-config sequencers — XLA CPU recompiles are the
    # dominant cost of every e2e suite (config salts keep mixed configs
    # distinct; the two-pass pair shares automatically)
    _sc = step_cache if step_cache is not None else {}

    def make_sequencer(freeze=False, init_map=None):
        return seq.Sequencer(
            photo_cfg=photo_cfg, step_cache=_sc,
            # range_transfer: sensor-native (range, t) int16 transfer with
            # device-side xyz reconstruction from the beam table — exact
            # for this generator, whose noise is radial (range_noise)
            ray_dirs=syn.beam_dirs(lm)[0] if range_transfer else None,
            seq_cfg=seq.SequencerConfig(
                max_scan_points=max(4096, n_scan_pts),
                n_geo_points=4096, n_map_points=8192,
                geo_leaf=0.4, map_insert_leaf=0.15,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=n_gn_iters, freeze_map=freeze,
                range_transfer=range_transfer,
            ),
            win_cfg=win.WindowConfig(K=6),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=17,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(
                sigma=0.05, loc_count_thresh=50.0, use_4dof=use_4dof,
                project_degenerate=project_degenerate),
            dtype=jnp.float64 if str(dtype) in ("float64", "f64")
            else jnp.float32, init_map=init_map,
        )

    def replay(s):
        # event-ordered replay: all IMU up to each scan end first (the
        # lidar_collection_delay queue of mimosa_rosbag.cpp:111-115)
        imu = data["imu"]
        imu_i = 0
        n = 0
        for scan in data["scans"]:
            t_end = scan["ts_header"] + scan["t_rel"].max()
            while imu_i < len(imu["ts"]) and \
                    imu["ts"][imu_i] <= t_end + 0.03:
                s.add_imu(imu["ts"][imu_i], imu["acc"][imu_i],
                          imu["gyro"][imu_i])
                imu_i += 1
            s.add_scan(scan["ts_header"], scan["points"], scan["t_rel"],
                       scan["valid"], intensity=scan.get("intensity"))
            n += 1
        return n

    t0 = time.time()
    s = make_sequencer()
    n_scans = replay(s)
    wall = time.time() - t0
    if two_pass:
        # mapping->localization refinement: re-run against the frozen
        # final map (io/replay.py two_pass docstring). Timed separately —
        # wall/n_scans stay a single-pass throughput figure.
        s = make_sequencer(freeze=True, init_map=s.vmap)
        replay(s)

    est_ts = [t for t, _, _ in s.trajectory]
    est_p = [p for _, p, _ in s.trajectory]
    import numpy as np
    ate = syn.ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                       data["gt"]["ts"], data["gt"]["pos"])
    ate_smooth = None
    if smooth:
        # pass 3: global batch smoothing of the whole trajectory
        from mimosa_tpu.graph import refine
        imu = data["imu"]
        s.smoothed = refine.smooth(s, imu["ts"], imu["acc"], imu["gyro"])
        sm_ts, _, sm_p = s.smoothed
        ate_smooth = syn.ate_rmse(sm_ts, sm_p, data["gt"]["ts"],
                                  data["gt"]["pos"])
    if verbose:
        print(f"replayed {n_scans} scans in {wall:.1f}s "
              f"({n_scans / max(wall, 1e-9):.1f} scans/s incl. compile)")
        print(f"counters: {s.counters}")
        print(f"ATE RMSE: {ate:.4f} m (gate: < 0.10 m)"
              + (f"  smoothed: {ate_smooth:.4f} m" if smooth else ""))
    return dict(ate=ate, wall=wall, n_scans=n_scans, counters=s.counters,
                sequencer=s, data=data, ate_smooth=ate_smooth)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--t-total", type=float, default=12.0)
    args = ap.parse_args()
    out = run(platform=args.platform, t_total=args.t_total)
    raise SystemExit(0 if out["ate"] < 0.10 else 1)
