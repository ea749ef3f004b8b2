"""Round-5 probe B: attack the photo-bulk H2D wall.

probe_r5 measured the photo bulk chunk's device_put at 141 ms/chunk
(42 MB -> ~0.3 GB/s) while the geo chunk's 8.4 MB put ran at 2.9 GB/s in
the SAME session — the relay moves one big message much slower than
small ones. Candidates measured here:
1. raw H2D size scaling: one 42 MB put vs 4x / 8x chained slice puts;
2. the sensor-native range codec on the photometric bulk path
   (6 B/pt vs 10 B/pt: [r, t, intensity] int16 lanes).

No readbacks before the last timed replay (CLAUDE.md). One JSON line
per phase.
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.lidar import photometric as ph
    from mimosa_tpu.mapping import voxel_hash as vh

    # ---- phase 1: raw H2D size scaling (int16, photo chunk shape)
    rng = np.random.default_rng(0)
    big = rng.integers(-1000, 1000, (32, 131072, 5), np.int16)
    out1 = {"probe": "h2d_scaling", "mb": round(big.nbytes / 1e6, 1)}
    for tag, nsplit in (("one", 1), ("x4", 4), ("x8", 8), ("one2", 1),
                        ("x4_2", 4)):
        k = nsplit
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            if k == 1:
                d = jax.device_put(big)
                jax.block_until_ready(d)
            else:
                parts = [jax.device_put(big[i::k]) for i in range(k)]
                jax.block_until_ready(parts)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        out1[tag] = {"ms": round(1e3 * med, 1),
                     "gbps": round(big.nbytes / med / 1e9, 2)}
    print(json.dumps(out1), flush=True)

    # ---- phase 2: photometric bulk with the range codec
    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    lm = syn.LidarModel(n_rows=128, n_cols=1024)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)
    scans, imu = data["scans"], data["imu"]
    step_cache = {}

    def make_sequencer(range_transfer):
        photo_cfg = ph.PhotometricConfig(
            rows=lm.n_rows, cols=lm.n_cols, fov_up=lm.fov_up,
            fov_down=lm.fov_down, range_min=0.5, range_max=60.0,
            gradient_threshold=2.0, nma_radius=5, num_features=64,
            margin=3, intensity_scale=1.0)
        return seq.Sequencer(
            photo_cfg=photo_cfg,
            ray_dirs=syn.beam_dirs(lm)[0] if range_transfer else None,
            seq_cfg=seq.SequencerConfig(
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=3, range_transfer=range_transfer,
                max_scan_points=lm.n_rows * lm.n_cols,
                point_skip=1, geo_skip=4),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(), dtype=jnp.float32,
            step_cache=step_cache)

    def replay_bulk(range_transfer):
        s = make_sequencer(range_transfer)
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        for i in range(20):
            sc = scans[i]
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"], intensity=sc.get("intensity"))
        jax.block_until_ready(s.window.p)
        t0 = time.time()
        s.add_scans_bulk(scans[20:], chunk=32)
        jax.block_until_ready(s.window.p)
        return (len(scans) - 20) / (time.time() - t0), s

    out2 = {"probe": "photo_bulk_range"}
    for tag, rt in (("xyz", False), ("range", True), ("xyz2", False),
                    ("range2", True)):
        r, s = replay_bulk(rt)
        out2[tag] = {
            "rate": round(r, 1),
            **{k: round(v["mean_ms"], 2)
               for k, v in s.timers.summary().items()
               if k.startswith("t_bulk")}}
        out2[tag + "_seq"] = tag          # keep last seqs for ATE
        if tag == "range2":
            s_range = s
        if tag == "xyz2":
            s_xyz = s
    print(json.dumps(out2), flush=True)

    def _ate(sq):
        ts = np.asarray([t for t, _, _ in sq.trajectory])
        p = np.asarray([p for _, p, _ in sq.trajectory])
        return float(syn.ate_rmse(ts, p, data["gt"]["ts"],
                                  data["gt"]["pos"]))
    print(json.dumps({"probe": "photo_range_ate",
                      "xyz": round(_ate(s_xyz), 4),
                      "range": round(_ate(s_range), 4)}), flush=True)


if __name__ == "__main__":
    main()
