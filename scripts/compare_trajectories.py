"""Method-vs-method trajectory comparison (the reference's
scripts/evaluation.py workflow, ref mimosa/scripts/evaluation.py:23-25 —
there driven through bag topic extraction + evo; here TUM files from any
source, e.g. mimosa_tpu replays, the reference's own logs, FAST-LIVO2
exports).

Usage:
    python scripts/compare_trajectories.py --gt gt.tum \
        mimosa_tpu=/tmp/ours.tum reference=/tmp/ref.tum [...]

Prints a markdown table of ATE (SE(3)-aligned APE translation RMSE) and
RTE (relative error % over 10 m) per method, best in bold.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimosa_tpu.utils import evaluation as ev  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True, help="ground-truth TUM/csv")
    ap.add_argument("--delta-m", type=float, default=10.0,
                    help="RTE segment length (m)")
    ap.add_argument("--max-diff", type=float, default=0.02,
                    help="timestamp association tolerance (s)")
    ap.add_argument("methods", nargs="+",
                    help="name=trajectory.tum pairs")
    args = ap.parse_args()

    gt_ts, gt_p, _ = ev.load_tum(args.gt)
    rows = []
    for spec in args.methods:
        if "=" in spec:
            name, path = spec.split("=", 1)
        else:
            name, path = os.path.splitext(os.path.basename(spec))[0], spec
        ts, p, _ = ev.load_tum(path)
        rows.append((name,
                     ev.ate(ts, p, gt_ts, gt_p, max_diff=args.max_diff),
                     ev.rte(ts, p, gt_ts, gt_p, delta_m=args.delta_m,
                            max_diff=args.max_diff),
                     len(ts)))

    ates = [r[1] for r in rows if np.isfinite(r[1])]
    best_ate = min(ates) if ates else float("nan")
    rtes = [r[2] for r in rows if np.isfinite(r[2])]
    best_rte = min(rtes) if rtes else float("nan")
    print(f"| method | ATE (m) | RTE (% / {args.delta_m:.0f} m) | poses |")
    print("|---|---|---|---|")
    for name, a, r, n in rows:
        sa = f"**{a:.3f}**" if a == best_ate else f"{a:.3f}"
        sr = f"**{r:.2f}**" if r == best_rte else f"{r:.2f}"
        print(f"| {name} | {sa} | {sr} | {n} |")


if __name__ == "__main__":
    main()
