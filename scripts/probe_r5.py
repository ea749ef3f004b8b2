"""Round-5 TPU probes (run ONE at a time on the tunneled TPU):

1. photo-bulk attribution: per-chunk t_bulk_pack/put/dispatch stage split
   for the geo bulk vs the photo bulk path (VERDICT r4 weak #1 — photo
   bulk measured 2.4x slower than photo streaming with no stage data).
2. single-chip sharding tax: the same streaming replay through
   Sequencer(mesh=make_mesh(1)) vs unsharded — the first perf datum ever
   taken on parallel/sharded.py on real hardware (VERDICT r4 #2).
3. chunk-tail tradeoff: bulk chunk=32 + streamed tail vs + chunk=8 tail
   programs at a 300-scan length (VERDICT r4 #6).

No device->host readback happens before the last timed replay (the first
readback permanently degrades the relay session to ~41 scans/s —
CLAUDE.md). Prints one JSON line per probe phase.
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
    from mimosa_tpu.mapping import voxel_hash as vh
    from mimosa_tpu.parallel import sharded as par

    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    lm = syn.LidarModel(n_rows=128, n_cols=1024)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)
    scans, imu = data["scans"], data["imu"]

    step_cache = {}

    def make_sequencer(photo=False, mesh=None):
        photo_cfg = None
        if photo:
            from mimosa_tpu.lidar import photometric as ph
            photo_cfg = ph.PhotometricConfig(
                rows=lm.n_rows, cols=lm.n_cols, fov_up=lm.fov_up,
                fov_down=lm.fov_down, range_min=0.5, range_max=60.0,
                gradient_threshold=2.0, nma_radius=5, num_features=64,
                margin=3, intensity_scale=1.0)
        skip_kw = (dict(max_scan_points=lm.n_rows * lm.n_cols,
                        point_skip=1, geo_skip=4) if photo else
                   dict(max_scan_points=lm.n_rows * lm.n_cols // 4,
                        point_skip=4))
        return seq.Sequencer(
            photo_cfg=photo_cfg, mesh=mesh,
            seq_cfg=seq.SequencerConfig(
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=3, **skip_kw),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(), dtype=jnp.float32,
            step_cache=step_cache)

    def replay_bulk(photo=False, tail_chunk=None, data_=None):
        d = data_ or data
        sc_, im_ = d["scans"], d["imu"]
        s = make_sequencer(photo=photo)
        s.add_imu_batch(im_["ts"], im_["acc"], im_["gyro"])
        n_warm = 20
        for i in range(n_warm):
            sc = sc_[i]
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"], intensity=sc.get("intensity"))
        jax.block_until_ready(s.window.p)
        t0 = time.time()
        s.add_scans_bulk(sc_[n_warm:], chunk=32, tail_chunk=tail_chunk)
        jax.block_until_ready(s.window.p)
        wall = time.time() - t0
        return (len(sc_) - n_warm) / wall, wall, s

    def replay_stream(mesh=None):
        s = make_sequencer(mesh=mesh)
        imu_i = 0
        n_warm = 20
        scan_ts = []
        t0 = None
        staged = s.stage_scan(scans[0]["ts_header"], scans[0]["points"],
                              scans[0]["t_rel"], scans[0]["valid"])
        for i in range(len(scans)):
            if i == n_warm:
                jax.block_until_ready(s.window.p)
                t0 = time.time()
            st = staged
            th0 = time.perf_counter()
            j = int(np.searchsorted(imu["ts"], st["t_end"] + 0.03,
                                    "right"))
            if j > imu_i:
                s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                                imu["gyro"][imu_i:j])
                imu_i = j
            s.add_scan(st["ts_header"], staged=st)
            if i + 1 < len(scans):
                sc = scans[i + 1]
                staged = s.stage_scan(sc["ts_header"], sc["points"],
                                      sc["t_rel"], sc["valid"])
            if t0 is not None:
                scan_ts.append(time.perf_counter() - th0)
        jax.block_until_ready(s.window.p)
        rate = (len(scans) - n_warm) / (time.time() - t0)
        return rate, 1e3 * float(np.median(scan_ts)), s

    # ---- phase 1: bulk stage attribution (2 warm reps each, geo/photo)
    out1 = {"probe": "bulk_stage_split"}
    for name, photo in (("geo", False), ("photo", True)):
        rates, walls, tmr = [], [], None
        for rep in range(3):
            r, w, s = replay_bulk(photo=photo)
            rates.append(round(r, 1))
            walls.append(round(w, 3))
            tmr = s.timers.summary()
        out1[name] = {
            "rates": rates, "walls_s": walls,
            **{k: round(v["mean_ms"], 3) for k, v in tmr.items()
               if k.startswith("t_bulk")},
            "n_chunks": tmr.get("t_bulk_pack", {}).get("count", 0),
        }
    print(json.dumps(out1), flush=True)

    # ---- phase 2: sharding tax (mesh n=1) vs unsharded streaming
    out2 = {"probe": "shard_tax"}
    try:
        r_u, med_u, _ = replay_stream(mesh=None)
        mesh = par.make_mesh(1, n_mp=1)
        r_s1, med_s1, _ = replay_stream(mesh=mesh)
        r_s2, med_s2, _ = replay_stream(mesh=mesh)
        r_u2, med_u2, _ = replay_stream(mesh=None)
        out2.update(unsharded_rates=[round(r_u, 1), round(r_u2, 1)],
                    unsharded_med_ms=[round(med_u, 3), round(med_u2, 3)],
                    sharded_rates=[round(r_s1, 1), round(r_s2, 1)],
                    sharded_med_ms=[round(med_s1, 3), round(med_s2, 3)])
    except Exception as e:      # noqa: BLE001 — record, keep probing
        out2["error"] = repr(e)
    print(json.dumps(out2), flush=True)

    # ---- phase 3: chunk-tail tradeoff at 300-scan length
    tc30 = syn.TrajectoryConfig(t_total=30.0, amp=(6.0, 3.0, 0.8),
                                center=(12.0, 8.0, 2.0))
    d30 = syn.generate(world, tc30, lm, seed=0, imu_noise=0.01,
                       range_noise=0.01)
    out3 = {"probe": "chunk_tail", "n_scans": len(d30["scans"])}
    for tag, tk in (("no_tail", None), ("tail8", 8), ("no_tail2", None),
                    ("tail8_2", 8)):
        r, w, s = replay_bulk(data_=d30, tail_chunk=tk)
        out3[tag] = {"rate": round(r, 1), "wall_s": round(w, 3)}
    print(json.dumps(out3), flush=True)

    # ---- end-of-process readbacks (ATE sanity; free AFTER last replay)
    def _ate(sq, d):
        ts = np.asarray([t for t, _, _ in sq.trajectory])
        p = np.asarray([p for _, p, _ in sq.trajectory])
        return syn.ate_rmse(ts, p, d["gt"]["ts"], d["gt"]["pos"])
    print(json.dumps({"probe": "ate_tail8", "ate_m":
                      round(float(_ate(s, d30)), 4)}), flush=True)


if __name__ == "__main__":
    main()
