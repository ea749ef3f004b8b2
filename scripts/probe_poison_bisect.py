"""Binary-search which sequencer action flips the relay into slow mode.

Usage: python scripts/probe_poison_bisect.py <mode>
modes:
  none        probe only
  int16       upload 30 int16 scan buffers, probe
  stage       Sequencer + 30x stage_scan (real uploads), probe
  seqinit     Sequencer construction only, probe
  benchstep   compile+run the bench-config _scan_step once, probe
  replay10    feed 10 full scans through add_scan, probe
  marg        run _marginalize_host once (after 9 scans? no - jit direct), probe
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g


def probe(label):
    fn, args = g.entry()
    jfn = jax.jit(fn)

    def feed(cur, out):
        (w, vmap, preints, fv, _f, kf_q, kf_p, kf_count,
         traj_q, traj_p, debug_rec) = out
        nxt = list(cur)
        nxt[0], nxt[1], nxt[2], nxt[3] = w, vmap, preints, fv
        nxt[7], nxt[8], nxt[9] = kf_q, kf_p, kf_count
        nxt[10], nxt[11], nxt[12] = traj_q, traj_p, debug_rec
        return nxt

    out = jfn(*args)
    jax.block_until_ready(out)
    cur = list(args)
    t0 = time.time()
    for _ in range(30):
        out = jfn(*cur)
        cur = feed(cur, out)
    jax.block_until_ready(out)
    print(f"probe[{label}]: {(time.time()-t0)/30*1000:7.2f} ms/step",
          flush=True)


def make_seq():
    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(
            max_scan_points=32768, point_skip=4,
            n_geo_points=8192, n_map_points=16384,
            geo_leaf=0.5, map_insert_leaf=0.2,
            keyframe_trans_thresh=0.3, keyframe_rot_thresh=0.15,
            n_gn_iters=3),
        win_cfg=win.WindowConfig(K=8),
        map_cfg=vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=19,
                                  plane_min_points=5, lru_horizon=0),
        geo_cfg=geo.GeometricConfig(), dtype=jnp.float32)


def main():
    mode = sys.argv[1]
    print("device:", jax.devices()[0], "mode:", mode, flush=True)
    rng = np.random.default_rng(0)
    if mode == "none":
        pass
    elif mode == "int16":
        xs = [jnp.asarray(rng.integers(-30000, 30000, (32768, 4))
                          .astype(np.int16)) for _ in range(30)]
        jax.block_until_ready(xs)
    elif mode == "seqinit":
        make_seq()
    elif mode == "gen":
        from mimosa_tpu.io import synthetic as syn
        world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
        tc = syn.TrajectoryConfig(t_total=3.0)
        syn.generate(world, tc, syn.LidarModel(n_rows=128, n_cols=1024),
                     seed=0)
    elif mode == "gencpu":
        from mimosa_tpu.io import synthetic as syn
        world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
        tc = syn.TrajectoryConfig(t_total=3.0)
        with jax.default_device(jax.devices("cpu")[0]):
            syn.generate(world, tc,
                         syn.LidarModel(n_rows=128, n_cols=1024), seed=0)
    elif mode == "stage":
        from mimosa_tpu.io import synthetic as syn
        s = make_seq()
        world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
        tc = syn.TrajectoryConfig(t_total=3.0, amp=(6.0, 3.0, 0.8),
                                  center=(12.0, 8.0, 2.0))
        lm = syn.LidarModel(n_rows=128, n_cols=1024)
        data = syn.generate(world, tc, lm, seed=0)
        hs = [s.stage_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                           sc["valid"]) for sc in data["scans"]]
        jax.block_until_ready([h["scan_dev"] for h in hs])
    elif mode == "replay10":
        from mimosa_tpu.io import synthetic as syn
        s = make_seq()
        world = syn.room_world(lx=30.0, ly=16.0, lz=6.0)
        tc = syn.TrajectoryConfig(t_total=3.0, amp=(6.0, 3.0, 0.8),
                                  center=(12.0, 8.0, 2.0))
        lm = syn.LidarModel(n_rows=128, n_cols=1024)
        data = syn.generate(world, tc, lm, seed=0)
        imu = data["imu"]
        ii = 0
        for sc in data["scans"][:10]:
            t_end = sc["ts_header"] + np.nan_to_num(sc["t_rel"]).max()
            while ii < len(imu["ts"]) and imu["ts"][ii] <= t_end + 0.03:
                s.add_imu(imu["ts"][ii], imu["acc"][ii], imu["gyro"][ii])
                ii += 1
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"])
        jax.block_until_ready(s.window.p)
    probe(mode)
    probe(mode + "/2")


if __name__ == "__main__":
    main()
