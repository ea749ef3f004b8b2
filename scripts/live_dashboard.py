"""Live debug dashboard — the plotjuggler stand-in.

Tails the JSONL debug stream written by ``mimosa_tpu.io.viz.DebugStream``
(wired via ``python -m mimosa_tpu.io.replay --debug-stream s.jsonl``) and
re-renders the reference's dashboard signals (inlier counts, rejection
statuses, mean residual, degeneracy flags, photometric statuses, IMU
localizability — mimosa/plotjuggler/mimosa*.xml layouts) plus the live XY
trajectory into a PNG every ``--interval`` seconds.

With ``--serve PORT`` it also runs a tiny HTTP server with an
auto-refreshing page, so the run can be watched live in a browser while
the replay is in flight (the rviz/plotjuggler "live" experience without
ROS).

Usage:
  python scripts/live_dashboard.py stream.jsonl -o live.png          # once
  python scripts/live_dashboard.py stream.jsonl --follow             # tail
  python scripts/live_dashboard.py stream.jsonl --follow --serve 8000
"""

import argparse
import json
import os
import threading
import time

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def read_stream(path):
    rows = []
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln:
                    continue
                try:
                    rows.append(json.loads(ln))
                except json.JSONDecodeError:
                    break  # partial last line while the writer is mid-flush
    except FileNotFoundError:
        pass
    return rows


def render(rows, out_png):
    if not rows:
        return False
    g = lambda k, d=0.0: np.asarray([r.get(k, d) for r in rows])  # noqa
    scan = g("scan")
    p = np.asarray([r["p"] for r in rows], float)
    stat = np.asarray([r["icp_status"] for r in rows], float)
    degen_t = np.asarray([r["degen_trans"] for r in rows], float)
    degen_r = np.asarray([r["degen_rot"] for r in rows], float)
    loc = np.asarray([r.get("imu_loc_pos", [0, 0, 0]) for r in rows],
                     float)

    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    ax = axes[0, 0]
    ax.plot(scan, g("icp_inliers"), label="inliers")
    for i, name in enumerate(["no_plane", "max_dist", "s_gate"], start=1):
        ax.plot(scan, stat[:, i], label=name, alpha=0.7)
    ax.set_title("ICP point statuses")
    ax.legend(fontsize=8)

    ax = axes[0, 1]
    ax.plot(scan, g("mean_abs_res"))
    ax.set_title("mean |point-to-plane residual| [m]")

    ax = axes[0, 2]
    for i in range(3):
        ax.plot(scan, degen_r[:, i] + 2.2, alpha=0.7,
                label=f"rot{i}" if i == 0 else None)
        ax.plot(scan, degen_t[:, i], alpha=0.7,
                label=f"trans{i}" if i == 0 else None)
    ax.set_title("degeneracy flags (trans 0/1, rot offset +2.2)")
    ax.set_ylim(-0.2, 3.5)

    ax = axes[1, 0]
    ax.plot(p[:, 0], p[:, 1], lw=0.9)
    ax.scatter([p[-1, 0]], [p[-1, 1]], marker="*", s=120, c="tab:red")
    ax.set_title(f"trajectory XY [m] — scan {int(scan[-1])}")
    ax.axis("equal")

    ax = axes[1, 1]
    ax.plot(scan, g("photo_tracked"), label="photo tracked")
    ax.plot(scan, g("n_active"), label="window n_active", alpha=0.7)
    ax.legend(fontsize=8)
    ax.set_title("photometric tracked / window occupancy")

    ax = axes[1, 2]
    for i in range(3):
        ax.semilogy(scan, np.maximum(loc[:, i], 1e-12), alpha=0.8,
                    label=f"pos eig{i}")
    ax.set_title("IMU-factor pos localizability eigvals")
    ax.legend(fontsize=8)

    fig.tight_layout()
    tmp = out_png + ".tmp.png"
    fig.savefig(tmp, dpi=100)
    plt.close(fig)
    os.replace(tmp, out_png)  # atomic: the HTTP server never sees a torn file
    return True


_INDEX_HTML = """<!doctype html><html><head>
<meta http-equiv="refresh" content="1">
<title>mimosa_tpu live</title></head>
<body style="background:#111;margin:0">
<img src="{img}?t={{}}" style="width:100%">
<script>setInterval(()=>{{document.images[0].src='{img}?t='+Date.now()}},1000)
</script></body></html>"""


def serve(directory, img_name, port):
    import functools
    import http.server

    idx = os.path.join(directory, "index.html")
    with open(idx, "w") as f:
        f.write(_INDEX_HTML.format(img=img_name))
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=directory)
    handler.log_message = lambda *a, **k: None
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    print(f"serving http://127.0.0.1:{port}/ (auto-refresh)")
    return srv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", help="JSONL file written by DebugStream")
    ap.add_argument("-o", "--out", default="live.png")
    ap.add_argument("--follow", action="store_true",
                    help="keep tailing the stream and re-rendering")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--serve", type=int, metavar="PORT",
                    help="HTTP-serve an auto-refreshing page with the plot")
    ap.add_argument("--max-seconds", type=float, default=0.0,
                    help="stop following after this long (0 = forever)")
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    if args.serve:
        serve(os.path.dirname(out) or ".", os.path.basename(out),
              args.serve)

    t0 = time.time()
    n_prev = -1
    while True:
        rows = read_stream(args.stream)
        if len(rows) != n_prev:
            if render(rows, out):
                print(f"\r{len(rows)} scans -> {out}", end="", flush=True)
            n_prev = len(rows)
        if not args.follow:
            break
        if args.max_seconds and time.time() - t0 > args.max_seconds:
            break
        time.sleep(args.interval)
    print()


if __name__ == "__main__":
    main()
