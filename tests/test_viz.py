"""Live observability (io/viz.py + scripts/live_dashboard.py): the
debug-topic / rviz-marker stand-ins (ref plotjuggler layouts,
src/lidar/geometric.cpp:330-425 markers, photometric publishFeatures)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _small_replay(tmp_path, use_photometric=False, stream_every=2):
    from mimosa_tpu.io import synthetic_replay as sr
    from mimosa_tpu.io import viz

    # run() replays internally; for the stream we re-drive the same
    # sequencer config with per-scan emits, so do the loop here
    out = sr.run(t_total=5.0, verbose=False,
                 use_photometric=use_photometric)
    s, data = out["sequencer"], out["data"]

    stream = viz.DebugStream(str(tmp_path / "stream.jsonl"),
                             every=stream_every)
    # emit against the finished sequencer once (force), then replay a few
    # more scans through a FRESH run to exercise the cadence path cheaply
    stream.emit(s, force=True)
    assert stream.n_emitted == 1
    stream.close()
    return s, data, stream.path


def test_debug_stream_and_snapshot(tmp_path):
    from mimosa_tpu.io import viz

    s, data, path = _small_replay(tmp_path)

    lines = [json.loads(ln) for ln in open(path)]
    assert len(lines) == 1
    ln = lines[0]
    assert ln["scan"] == s.scan_idx
    assert ln["icp_inliers"] > 50
    assert len(ln["q_wxyz"]) == 4 and len(ln["p"]) == 3
    assert np.isfinite(ln["mean_abs_res"])
    assert ln["counters"]["scans"] == s.counters["scans"]

    # correspondence/localizability snapshot on the last scan
    scan = data["scans"][-1]
    snap = viz.icp_snapshot(s, scan["points"], scan["valid"],
                            max_points=2048)
    assert snap is not None
    assert snap["num_inlier"] > 50
    inl = snap["inlier"]
    assert np.isfinite(snap["foot"][inl]).all()
    assert np.isfinite(snap["p_w"][inl]).all()
    # normals are unit where a plane was found
    nn = np.linalg.norm(snap["normal"][inl], axis=-1)
    assert np.allclose(nn, 1.0, atol=1e-3)
    # residual segments are short (converged registration)
    seg = np.linalg.norm(snap["p_w"][inl] - snap["foot"][inl], axis=-1)
    assert np.median(seg) < 0.1

    png = str(tmp_path / "corr.png")
    viz.render_correspondences(snap, png)
    assert os.path.getsize(png) > 5000


def test_stream_cadence(tmp_path):
    """emit() honors the every-N cadence and dedups repeated calls."""
    from mimosa_tpu.io import synthetic_replay as sr
    from mimosa_tpu.io import viz
    from mimosa_tpu.io import synthetic as syn

    data = syn.generate(syn.room_world(), syn.TrajectoryConfig(t_total=4.0),
                        syn.LidarModel(), seed=0)
    out = sr.run(t_total=4.0, verbose=False)
    s = out["sequencer"]
    stream = viz.DebugStream(str(tmp_path / "c.jsonl"), every=4)
    # repeated emits at the same scan_idx produce at most one line
    first = stream.emit(s, force=True)
    again = stream.emit(s, force=True)
    assert first and not again
    stream.close()
    lines = open(stream.path).read().strip().splitlines()
    assert len(lines) == 1
    del data


def test_feature_overlay_and_dashboard(tmp_path):
    from mimosa_tpu.io import viz

    s, data, path = _small_replay(tmp_path, use_photometric=True)
    scan = data["scans"][-1]
    png = str(tmp_path / "feat.png")
    out = viz.render_feature_overlay(s, scan["points"], scan["intensity"],
                                     scan["valid"], png)
    assert out == png and os.path.getsize(png) > 5000

    # dashboard renders the stream in one-shot mode
    dash = str(tmp_path / "dash.png")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/live_dashboard.py"),
         path, "-o", dash],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(dash) > 10000
