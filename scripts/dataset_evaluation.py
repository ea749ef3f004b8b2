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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--imu-topic", required=True)
    ap.add_argument("--lidar-topic", required=True)
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
    args = ap.parse_args()

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
