"""Plot per-scan debug records + trajectory — the plotjuggler/rviz stand-in.

Reads a sequencer checkpoint (utils/checkpoint.py) and renders the
reference's debug-dashboard signals (inlier counts, rejection statuses,
mean residual, degeneracy flags — mimosa/plotjuggler/mimosa*.xml layouts)
plus the XY trajectory, into one PNG.

Usage: python scripts/plot_debug.py ckpt.npz -o debug.png
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("-o", "--out", default="debug.png")
    args = ap.parse_args()

    z = np.load(args.checkpoint)
    meta = json.loads(bytes(z["_meta"]).decode())
    n_scan = int(meta["host"]["scan_idx"])
    rec = z["debug_rec__0"][:n_scan]
    ts = meta["host"]["_traj_ts"]
    tp = z["traj_p__0"][: len(ts)]

    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    ax = axes[0, 0]
    ax.plot(rec[:, 0], label="inliers")
    for i, name in enumerate(["no_plane", "max_dist", "s_gate"], start=2):
        ax.plot(rec[:, i], label=name, alpha=0.7)
    ax.set_title("ICP point statuses per scan")
    ax.legend(fontsize=8)

    ax = axes[0, 1]
    ax.plot(rec[:, 5])
    ax.set_title("mean |point-to-plane residual| [m]")

    ax = axes[0, 2]
    for i, name in zip(range(6, 12), ["rot x", "rot y", "rot z",
                                      "trans x", "trans y", "trans z"]):
        ax.plot(rec[:, i], label=name, alpha=0.7)
    ax.set_title("degeneracy flags per eigen axis")
    ax.set_ylim(-0.1, 1.1)
    ax.legend(fontsize=7)

    ax = axes[1, 0]
    ax.plot(tp[:, 0], tp[:, 1], lw=0.8)
    ax.set_title("trajectory XY [m]")
    ax.axis("equal")

    ax = axes[1, 1]
    ax.plot(ts, tp[:, 2], lw=0.8)
    ax.set_title("z over time")

    ax = axes[1, 2]
    ax.plot(rec[:, 12], label="photo tracked")
    ax.plot(rec[:, 13], label="photo oob", alpha=0.6)
    ax.plot(rec[:, 15], label="photo ncc-rej", alpha=0.6)
    ax.set_title("photometric feature statuses")
    ax.legend(fontsize=8)

    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
