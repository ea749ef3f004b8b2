"""Probe: multimodal bulk (lidar+radar) throughput on the tunneled TPU.

Measures events/s of Sequencer.add_bulk on a synthetic lidar(10 Hz,
128x1024) + radar(20 Hz) stream vs the scans-only bulk and the streaming
path — the offline DR-LRIO (LiDAR-radar-inertial) batch-processing rate.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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

    world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
    tc = syn.TrajectoryConfig(t_total=9.0, amp=(6.0, 3.0, 0.8),
                              center=(12.0, 8.0, 2.0))
    lm = syn.LidarModel(n_rows=128, n_cols=1024)
    data = syn.generate(world, tc, lm, seed=0, imu_noise=0.01,
                        range_noise=0.01)
    traj = syn.make_trajectory(tc)
    radar = syn.generate_radar(traj, tc, seed=0)
    step_cache = {}

    def make_sequencer():
        return seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                n_geo_points=8192, n_map_points=16384,
                geo_leaf=0.5, map_insert_leaf=0.2,
                keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
                n_gn_iters=3,
                max_scan_points=lm.n_rows * lm.n_cols // 4, point_skip=4,
            ),
            win_cfg=win.WindowConfig(K=8),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32, step_cache=step_cache,
        )

    imu = data["imu"]
    scans = data["scans"]
    msgs = list(scans) + [
        dict(kind="radar", ts=fr["ts"], points_r=fr["points"],
             doppler=fr["doppler"], snr_db=fr["snr_db"]) for fr in radar]

    def replay_mm(chunk=32):
        s = make_sequencer()
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        n_warm = 12
        for sc in scans[:n_warm]:
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"])
        jax.block_until_ready(s.window.p)
        later = [m for m in msgs
                 if (m.get("kind", "scan") == "radar" and
                     m["ts"] > s.last_state_ts)
                 or (m.get("kind", "scan") == "scan" and
                     seq.Sequencer._scan_t_end(m) > s.last_state_ts)]
        t0 = time.time()
        s.add_bulk(later, chunk=chunk)
        t_host = time.time() - t0
        jax.block_until_ready(s.window.p)
        dt = time.time() - t0
        n_sc = sum(1 for m in later if m.get("kind", "scan") == "scan")
        print(f"    host/dispatch {1e3 * t_host:.0f} ms, device drain "
              f"{1e3 * (dt - t_host):.0f} ms over {len(later)} events",
              flush=True)
        return len(later) / dt, n_sc / dt, s

    def replay_scans_only(chunk=32):
        s = make_sequencer()
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        n_warm = 12
        for sc in scans[:n_warm]:
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"])
        jax.block_until_ready(s.window.p)
        t0 = time.time()
        s.add_scans_bulk(scans[n_warm:], chunk=chunk)
        jax.block_until_ready(s.window.p)
        return (len(scans) - n_warm) / (time.time() - t0)

    for rep in range(3):
        ev_s, sc_s, s = replay_mm()
        print(f"[mm rep{rep}] {ev_s:.1f} events/s ({sc_s:.1f} scans/s + "
              f"radar), counters: scans={s.counters['scans']} "
              f"radar={s.counters.get('radar_frames', 0)} "
              f"radar_dropped={s.counters.get('radar_dropped', 0)}",
              flush=True)
        for name, st in sorted(s.timers.summary().items()):
            if name.startswith("t_bulk"):
                print(f"    {name}: {st['total_s'] * 1e3:.0f} ms "
                      f"({st['count']} chunks)", flush=True)
    for rep in range(3):
        print(f"[scans-only rep{rep}] {replay_scans_only():.1f} scans/s "
              "(same session, for comparison)", flush=True)

    est = [(t, p) for (t, p, _), src in zip(s.trajectory, s._traj_src)
           if src >= 0]
    ate = syn.ate_rmse(np.asarray([t for t, _ in est]),
                       np.asarray([p for _, p in est]),
                       data["gt"]["ts"], data["gt"]["pos"])
    print(f"ate={ate * 1e3:.1f} mm")


if __name__ == "__main__":
    main()
