"""Dataset evaluation harness — the evo ATE/RTE gate over full datasets.

Equivalent of the reference's scripts/dataset_evaluation.py:136-317: run
every sequence of a dataset through the offline replay, compute ATE (APE
translation RMSE, SE(3)-aligned) and RTE (RPE over 10 m, %), compare
against the COIN-LIO baselines the reference hard-codes, and emit a
markdown table with wins in bold.

Usage:
    python scripts/dataset_evaluation.py --dataset-dir /data/enwide \
        --config /root/reference/mimosa/config/enwide/params.yaml \
        --imu-topic /gt_box/livox/imu --lidar-topic /gt_box/lidar/points \
        [--config-override ablations/li.yaml] [--sequences tunnel_s ...]

Expected layout: <dataset-dir>/<sequence>/*.bag and
<dataset-dir>/<sequence>/gt.{tum,csv} ground truth.
"""

import argparse
import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# COIN-LIO published results on ENWIDE — the bar to beat
# (ref scripts/dataset_evaluation.py:152-154)
COIN_LIO_ATE = {
    "tunnel_s": 0.743, "tunnel_d": 0.487, "intersection_s": 0.466,
    "intersection_d": 1.912, "runway_s": 1.033, "runway_d": 2.437,
    "field_s": 0.232, "field_d": 0.581, "katzensee_s": 0.412,
    "katzensee_d": 0.592,
}
COIN_LIO_RTE = {
    "tunnel_s": 1.60, "tunnel_d": 1.59, "intersection_s": 1.25,
    "intersection_d": 1.69, "runway_s": 1.89, "runway_d": 2.98,
    "field_s": 0.85, "field_d": 1.83, "katzensee_s": 0.99,
    "katzensee_d": 1.61,
}


def find_gt(seq_dir):
    for pat in ("gt.tum", "gt.csv", "*gt*.tum", "*gt*.csv", "*.tum"):
        hits = sorted(glob.glob(os.path.join(seq_dir, pat)))
        if hits:
            return hits[0]
    return None


def compare_methods(bag_paths, methods, gt_path, out_dir):
    """Method-vs-method comparison (ref scripts/evaluation.py:23-25 +
    extract/compute loop): extract each method's odometry topic from the
    results bag(s) to TUM, score ATE (APE trans RMSE, aligned) and RTE
    (RPE point_distance over 10 m) against GT, and print one row per
    method — the head-to-head workflow (e.g. mimosa vs FAST-LIVO2)."""
    import numpy as np

    from mimosa_tpu.io.rosbag import Bag
    from mimosa_tpu.utils import evaluation as ev

    os.makedirs(out_dir, exist_ok=True)
    gt_ts, gt_p, _ = ev.load_tum(gt_path)
    rows = []
    for spec in methods:
        name, topic = spec.split("=", 1)
        ts, ps, qs = [], [], []
        for bag_path in bag_paths:
            for _topic, mtype, _t, msg in Bag(bag_path).messages(
                    topics=[topic]):
                if mtype != "nav_msgs/Odometry":
                    continue
                ts.append(msg["stamp"])
                ps.append(msg["p"])
                qs.append(msg["q"])
        if not ts:
            print(f"[skip] {name}: no messages on {topic}", file=sys.stderr)
            continue
        order = np.argsort(ts)
        ts = np.asarray(ts)[order]
        ps = np.asarray(ps)[order]
        qs = np.asarray(qs)[order]
        tum = os.path.join(out_dir, f"{name}.tum")
        with open(tum, "w") as f:
            for i in range(len(ts)):
                q, p = qs[i], ps[i]
                f.write(f"{ts[i]:.9f} {p[0]} {p[1]} {p[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}\n")
        rows.append(dict(method=name, poses=len(ts),
                         ate=ev.ate(ts, ps, gt_ts, gt_p),
                         rte=ev.rte(ts, ps, gt_ts, gt_p)))
        print(json.dumps(rows[-1]))

    lines = ["| method | poses | ATE (m) | RTE (%) |", "|---|---|---|---|"]
    best_ate = min((r["ate"] for r in rows), default=None)
    for r in rows:
        a = (f"**{r['ate']:.3f}**" if r["ate"] == best_ate
             else f"{r['ate']:.3f}")
        lines.append(f"| {r['method']} | {r['poses']} | {a} "
                     f"| {r['rte']:.2f} |")
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(out_dir, "comparison.md"), "w") as f:
        f.write(table + "\n")
    return rows


def _rte_vs_gt(s, data, smoothed=None):
    """RTE (%) of a sequencer trajectory (or smoothed tuple) against
    synthetic ground truth."""
    import numpy as np

    from mimosa_tpu.utils import evaluation as ev
    if smoothed is not None:
        ts, _, p = smoothed
    else:
        ts = np.asarray([t for t, _, _ in s.trajectory])
        p = np.asarray([p for _, p, _ in s.trajectory])
    return ev.rte(np.asarray(ts), np.asarray(p), data["gt"]["ts"],
                  data["gt"]["pos"])


# The standing synthetic accuracy suite — the per-round accuracy
# scoreboard (ACCURACY_r*.json, the counterpart of BENCH_r*.json; VERDICT
# r3 item 4). Real ENWIDE/Newer College bags are unavailable in this
# environment, so these exact-ground-truth sequences are the proxy: one
# row per scenario family the reference's table exercises (clean, noisy,
# degenerate corridor x pipeline, multimodal, refinement compositions).
# Gates mirror the e2e test gates (CLAUDE.md: <1 cm clean / <8 cm noisy;
# corridor hierarchy from tests/test_corridor_pglio.py).
def run_synthetic_suite(out_json=None, out_md=None, round_tag=None,
                        only=None):
    import numpy as np

    import jax
    # persistent compile cache: first-ever TPU compiles through the
    # relay cost minutes; cached reruns are seconds (same as bench.py).
    # NEVER on CPU: (de)serializing XLA:CPU executables segfaults on the
    # big window programs (CLAUDE.md compile-cache gotcha).
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    from mimosa_tpu.io import synthetic as syn
    from mimosa_tpu.io import synthetic_replay as sr

    noisy = dict(imu_noise=0.01, range_noise=0.01, verbose=False)
    # one compiled-program cache across the whole suite: repeated
    # configs (the room family, the corridor pair, two-pass) reuse
    # programs instead of recompiling (XLA CPU compiles dominate)
    _sc = {}

    def fast_spin():
        """Aggressive-motion sequence: ~1.8 rad/s sustained yaw with
        fast translation oscillation — stresses deskew and the re-skew
        path (a motion family the r4 suite lacked; VERDICT r4 weak #7)."""
        return sr.run(world=syn.room_world(), step_cache=_sc,
                      tc=syn.TrajectoryConfig(
                          t_total=8.0, yaw_rate=1.8,
                          amp=(3.0, 1.6, 0.4), freq=(0.22, 0.31, 0.40)),
                      seed=0, **noisy)

    def dropout_ooo():
        """Robustness sequence: 15% scan dropout plus adjacent-scan
        order swaps (scan-OOO path) and two same-key duplicates — the
        failure-handling counters must fire AND tracking must hold."""
        import jax.numpy as jnp

        from mimosa_tpu.graph import sequencer as seq
        from mimosa_tpu.graph import window as win
        from mimosa_tpu.lidar import geometric as geo
        from mimosa_tpu.mapping import voxel_hash as vh
        lm = syn.LidarModel()
        tc = syn.TrajectoryConfig(t_total=8.0)
        data = syn.generate(syn.room_world(), tc, lm, seed=3,
                            imu_noise=0.01, range_noise=0.01)
        s = seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                max_scan_points=max(4096, lm.n_rows * lm.n_cols),
                n_geo_points=4096, n_map_points=8192, geo_leaf=0.4,
                map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
                keyframe_rot_thresh=0.15, n_gn_iters=3),
            win_cfg=win.WindowConfig(K=6),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=17,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(),
            dtype=jnp.float32)
        rng = np.random.default_rng(7)
        scans = []
        for k, sc in enumerate(data["scans"]):
            if k > 8 and rng.random() < 0.15:
                continue                      # dropout
            scans.append(sc)
            if k in (15, 30):                 # same-key duplicates
                scans.append(dict(sc, ts_header=sc["ts_header"] + 2e-3))
        for k in range(10, len(scans) - 1, 9):
            scans[k], scans[k + 1] = scans[k + 1], scans[k]  # OOO swaps
        imu, imu_i = data["imu"], 0
        for sc in scans:
            te = seq.Sequencer._scan_t_end(sc)
            j = int(np.searchsorted(imu["ts"], te + 0.03, "right"))
            if j > imu_i:
                s.add_imu_batch(imu["ts"][imu_i:j], imu["acc"][imu_i:j],
                                imu["gyro"][imu_i:j])
                imu_i = j
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc.get("valid"))
        assert s.counters.get("scans_dropped_ooo", 0) \
            + s.counters.get("scans_ooo_inserted", 0) > 0
        assert s.counters.get("scans_same_key", 0) > 0
        est_t = np.asarray([t for t, _, _ in s.trajectory])
        est_p = np.asarray([p for _, p, _ in s.trajectory])
        ate = syn.ate_rmse(est_t, est_p, data["gt"]["ts"],
                           data["gt"]["pos"])
        return dict(ate=ate, sequencer=s, data=data, ate_smooth=None)

    def corridor_kw():
        return dict(world=syn.corridor_world(),
                    tc=syn.TrajectoryConfig(t_total=8.0, amp=(4.0, 0.6, 0.3),
                                            center=(40.0, 2.0, 1.5),
                                            yaw_rate=0.15),
                    seed=0, imu_noise=0.01, range_noise=0.005,
                    verbose=False)

    def corridor_radar():
        """Corridor + 20 Hz radar Doppler through the multimodal BULK
        scheduler (the DR-LRIO scenario, radar pinning the unobservable
        axis) — also keeps the headline bulk path inside the accuracy
        scoreboard."""
        import jax.numpy as jnp

        from mimosa_tpu.graph import sequencer as seq
        from mimosa_tpu.graph import window as win
        from mimosa_tpu.lidar import geometric as geo
        from mimosa_tpu.mapping import voxel_hash as vh
        kw = corridor_kw()
        lm = syn.LidarModel()
        data = syn.generate(kw["world"], kw["tc"], lm, seed=0,
                            imu_noise=0.01, range_noise=0.005)
        radar = syn.generate_radar(syn.make_trajectory(kw["tc"]), kw["tc"],
                                   seed=0)
        s = seq.Sequencer(
            seq_cfg=seq.SequencerConfig(
                max_scan_points=max(4096, lm.n_rows * lm.n_cols),
                n_geo_points=4096, n_map_points=8192, geo_leaf=0.4,
                map_insert_leaf=0.15, keyframe_trans_thresh=0.3,
                keyframe_rot_thresh=0.15, n_gn_iters=3),
            win_cfg=win.WindowConfig(K=6),
            map_cfg=vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=17,
                                      plane_min_points=5, lru_horizon=0),
            geo_cfg=geo.GeometricConfig(sigma=0.05, loc_count_thresh=50.0,
                                        project_degenerate=True),
            dtype=jnp.float32)
        imu = data["imu"]
        s.add_imu_batch(imu["ts"], imu["acc"], imu["gyro"])
        msgs = list(data["scans"]) + [
            dict(kind="radar", ts=fr["ts"], points_r=fr["points"],
                 doppler=fr["doppler"], snr_db=fr["snr_db"])
            for fr in radar]
        s.add_bulk(msgs, chunk=16)
        est_t = np.asarray([t for t, _, _ in s.trajectory])
        est_p = np.asarray([p for _, p, _ in s.trajectory])
        ate = syn.ate_rmse(est_t, est_p, data["gt"]["ts"],
                           data["gt"]["pos"])
        return dict(ate=ate, sequencer=s, data=data, ate_smooth=None)

    # (name, thunk, ate_gate_m, rte_gate_pct) — thunks return
    # synthetic_replay-style dicts; score ate_smooth when present. BOTH
    # metrics gate (ref dataset_evaluation.py:152-154 gates ATE and
    # RTE); gates sit 2-10x above the r4 measured values, tight enough
    # to catch a real regression, loose enough to ride run-to-run
    # chaos (CLAUDE.md: the estimator is chaotic near tracking loss).
    SEQS = [
        ("room_clean", lambda: sr.run(verbose=False, step_cache=_sc), 0.010, 0.5),
        ("room_noisy", lambda: sr.run(**noisy, step_cache=_sc), 0.080, 0.5),
        ("room_noisy_two_pass", lambda: sr.run(two_pass=True, **noisy, step_cache=_sc),
         0.080, 0.5),
        ("room_noisy_smooth",
         lambda: sr.run(two_pass=True, smooth=True, **noisy, step_cache=_sc), 0.080, 0.5),
        ("room_photometric",
         lambda: sr.run(use_photometric=True, **noisy, step_cache=_sc), 0.080, 0.5),
        ("room_range_codec",
         lambda: sr.run(range_transfer=True, **noisy, step_cache=_sc), 0.080, 0.5),
        # honest-IMU-drift scale (measured 0.73 m r4); the old 10.0 m
        # gate only caught total explosion (VERDICT r4 weak #7)
        ("corridor_geo_proj",
         lambda: sr.run(project_degenerate=True, step_cache=_sc,
                        **corridor_kw()),
         3.0, 40.0),
        ("corridor_pglio",
         lambda: sr.run(use_photometric=True, project_on_degeneracy=True,
                        project_degenerate=True, step_cache=_sc,
                        **corridor_kw()),
         0.80, 5.0),
        ("corridor_radar_bulk", corridor_radar, 0.20, 2.0),
        ("fast_spin", fast_spin, 0.080, 1.0),
        ("dropout_ooo", dropout_ooo, 0.080, 0.5),
    ]
    rows = []
    for name, thunk, gate, rte_gate in SEQS:
        if only and name not in only:
            continue
        out = thunk()
        ate = out["ate_smooth"] if out.get("ate_smooth") is not None \
            else out["ate"]
        sm = getattr(out["sequencer"], "smoothed", None)
        rte = _rte_vs_gt(out["sequencer"], out["data"], smoothed=sm)
        ok = bool(ate < gate) and bool(rte < rte_gate)
        rows.append(dict(sequence=name, ate_m=round(float(ate), 4),
                         rte_pct=round(float(rte), 3),
                         gate_m=gate, rte_gate_pct=rte_gate, passed=ok))
        print(f"{name:24s} ATE {ate:8.4f} m  RTE {rte:6.3f} %  "
              f"gates {gate:g}/{rte_gate:g}  {'PASS' if ok else 'FAIL'}")
    all_pass = all(r["passed"] for r in rows)
    # provenance: a CPU-run artifact must be distinguishable from a TPU
    # one, and the scores attributable to a commit (VERDICT r4 weak #7)
    import subprocess
    import time as _time
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_REPO,
            capture_output=True, text=True).stdout.strip() or None
    except OSError:
        commit = None
    import jax
    blob = dict(suite="synthetic_accuracy_v2", rows=rows,
                all_pass=all_pass,
                platform=jax.devices()[0].platform,
                commit=commit,
                date=_time.strftime("%Y-%m-%d"),
                **({"round": round_tag} if round_tag else {}))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(blob, f, indent=1)
        print(f"wrote {out_json}")
    if out_md:
        with open(out_md, "w") as f:
            f.write("# Synthetic accuracy scoreboard"
                    + (f" — round {round_tag}" if round_tag else "")
                    + "\n\n"
                    "Standing multi-sequence suite "
                    "(scripts/dataset_evaluation.py --synthetic): the "
                    "per-round accuracy counterpart of BENCH_r*.json. "
                    "Exact-ground-truth synthetic sequences; gates "
                    "mirror the e2e test gates.\n\n"
                    "| sequence | ATE [m] | RTE [%] | gate [m] | pass |\n"
                    "|---|---|---|---|---|\n")
            for r in rows:
                f.write(f"| {r['sequence']} | {r['ate_m']} | "
                        f"{r['rte_pct']} | {r['gate_m']} | "
                        f"{'yes' if r['passed'] else '**NO**'} |\n")
        print(f"wrote {out_md}")
    return blob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir")
    ap.add_argument("--config")
    ap.add_argument("--imu-topic")
    ap.add_argument("--lidar-topic")
    ap.add_argument("--radar-topic")
    ap.add_argument("--odom-topic")
    ap.add_argument("--config-override")
    ap.add_argument("--ouster-metadata")
    ap.add_argument("--sequences", nargs="*")
    ap.add_argument("--out", default="/tmp/mimosa_tpu_eval")
    ap.add_argument("--platform")
    ap.add_argument("--two-pass", action="store_true",
                    help="mapping->localization refinement per sequence")
    ap.add_argument("--smooth", action="store_true",
                    help="global batch smoothing per sequence")
    ap.add_argument("--compare-bags", nargs="*",
                    help="method-vs-method mode: results bag(s) holding "
                         "each method's odometry topic "
                         "(ref scripts/evaluation.py workflow)")
    ap.add_argument("--methods", nargs="*",
                    help="name=/odom/topic pairs for --compare-bags")
    ap.add_argument("--gt", help="ground-truth TUM file for --compare-bags")
    ap.add_argument("--synthetic", action="store_true",
                    help="run the standing synthetic accuracy suite "
                         "(the per-round ACCURACY_r*.json scoreboard) "
                         "instead of a bag dataset")
    ap.add_argument("--out-json", help="ACCURACY json path (--synthetic)")
    ap.add_argument("--out-md", help="ACCURACY markdown path (--synthetic)")
    ap.add_argument("--round", help="round tag stamped into the artifact")
    args = ap.parse_args()

    if args.synthetic:
        blob = run_synthetic_suite(out_json=args.out_json,
                                   out_md=args.out_md,
                                   round_tag=args.round,
                                   only=args.sequences or None)
        sys.exit(0 if blob["all_pass"] else 1)

    if args.compare_bags:
        if not (args.methods and args.gt):
            ap.error("--compare-bags requires --methods and --gt")
        compare_methods(args.compare_bags, args.methods, args.gt, args.out)
        return
    for req in ("dataset_dir", "config", "imu_topic", "lidar_topic"):
        if getattr(args, req) is None:
            ap.error(f"--{req.replace('_', '-')} is required "
                     "(unless using --compare-bags)")

    import numpy as np

    from mimosa_tpu.io.replay import replay_bag
    from mimosa_tpu.utils import evaluation as ev

    os.makedirs(args.out, exist_ok=True)
    seqs = args.sequences or sorted(
        d for d in os.listdir(args.dataset_dir)
        if os.path.isdir(os.path.join(args.dataset_dir, d)))
    rows = []
    for seq in seqs:
        seq_dir = os.path.join(args.dataset_dir, seq)
        bags = sorted(glob.glob(os.path.join(seq_dir, "*.bag")))
        if not bags:
            print(f"[skip] {seq}: no bag", file=sys.stderr)
            continue
        gt = find_gt(seq_dir)
        s = replay_bag(bags[0], args.config, args.imu_topic,
                       args.lidar_topic, args.radar_topic, args.odom_topic,
                       args.config_override, platform=args.platform,
                       ouster_metadata=args.ouster_metadata,
                       two_pass=args.two_pass, smooth=args.smooth)
        tum_path = os.path.join(args.out, f"{seq}.tum")
        smoothed = getattr(s, "smoothed", None)
        if smoothed is not None:
            # the saved artifact must be the trajectory the table scores
            sm_ts, sm_q, sm_p = smoothed
            with open(tum_path, "w") as f:
                for i in range(len(sm_ts)):
                    qq, pp = sm_q[i], sm_p[i]
                    f.write(f"{sm_ts[i]:.9f} {pp[0]} {pp[1]} {pp[2]} "
                            f"{qq[1]} {qq[2]} {qq[3]} {qq[0]}\n")
        else:
            s.write_tum(tum_path)
        row = dict(sequence=seq, poses=len(s.trajectory))
        if gt:
            gt_ts, gt_p, _ = ev.load_tum(gt)
            if smoothed is not None:
                est_ts, _, est_p = smoothed
            else:
                est_ts = np.asarray([t for t, _, _ in s.trajectory])
                est_p = np.asarray([p for _, p, _ in s.trajectory])
            row["ate"] = ev.ate(est_ts, est_p, gt_ts, gt_p)
            row["rte"] = ev.rte(est_ts, est_p, gt_ts, gt_p)
        rows.append(row)
        print(json.dumps(row))

    # markdown table vs COIN-LIO (bold = win), ref :242-303
    lines = ["| sequence | ATE (m) | best ATE | RTE (%) | best RTE |",
             "|---|---|---|---|---|"]
    for r in rows:
        if "ate" not in r:
            continue
        ba = COIN_LIO_ATE.get(r["sequence"])
        br = COIN_LIO_RTE.get(r["sequence"])
        a = f"**{r['ate']:.3f}**" if ba and r["ate"] < ba else f"{r['ate']:.3f}"
        t = f"**{r['rte']:.2f}**" if br and r["rte"] < br else f"{r['rte']:.2f}"
        lines.append(f"| {r['sequence']} | {a} | {ba} | {t} | {br} |")
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(args.out, "results.md"), "w") as f:
        f.write(table + "\n")


if __name__ == "__main__":
    main()
