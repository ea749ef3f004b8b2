"""End-to-end integration test: synthetic replay through the full pipeline.

The reference's integration test is deterministic dataset replay + evo ATE
(SURVEY.md §4); this is the same gate on a synthetic world with exact
ground truth, in production dtype (float32) with everything jitted.
"""

import numpy as np
import pytest

from mimosa_tpu.io import synthetic_replay as sr

# module-wide compiled-program sharing (same-config sr.run calls
# recompile everything otherwise; XLA CPU compiles dominate runtime)
_SC = {}


def test_e2e_clean():
    out = sr.run(t_total=6.0, verbose=False, step_cache=_SC)
    assert out["counters"]["scans_no_imu"] == 0
    assert out["sequencer"].num_keyframes > 5
    assert out["ate"] < 0.05, out["ate"]


@pytest.mark.heavy
def test_e2e_noisy_imu_and_range():
    out = sr.run(t_total=6.0, verbose=False, seed=3, imu_noise=0.02,
                 range_noise=0.01, step_cache=_SC)
    assert out["ate"] < 0.08, out["ate"]


def test_e2e_deterministic():
    a = sr.run(t_total=4.0, verbose=False, seed=5, step_cache=_SC)
    b = sr.run(t_total=4.0, verbose=False, seed=5, step_cache=_SC)
    ta = np.asarray([p for _, p, _ in a["sequencer"].trajectory])
    tb = np.asarray([p for _, p, _ in b["sequencer"].trajectory])
    np.testing.assert_array_equal(ta, tb)


@pytest.mark.heavy
def test_e2e_4dof_registration():
    """reg_4_dof (ref geometric_factor.hpp:255-259, the lri_4dof ablation):
    ICP constrains only yaw+translation, roll/pitch ride gravity/IMU — the
    full replay must still track."""
    out = sr.run(t_total=5.0, verbose=False, seed=1, imu_noise=0.01,
                 range_noise=0.005, use_4dof=True, step_cache=_SC)
    assert out["ate"] < 0.08, out["ate"]


@pytest.mark.heavy
def test_e2e_two_pass_refinement():
    """Mapping->localization two-pass (beyond the reference): pass 2
    registers every scan against the frozen FINAL map, so the early
    trajectory — which pass 1 estimated against a sparse newborn map —
    must come back at least as good, and the absolute gate tightens."""
    out1 = sr.run(t_total=6.0, verbose=False, seed=3, imu_noise=0.02,
                  range_noise=0.01, step_cache=_SC)
    out2 = sr.run(t_total=6.0, verbose=False, seed=3, imu_noise=0.02,
                  range_noise=0.01, two_pass=True, step_cache=_SC)
    assert out2["ate"] < 0.05, (out1["ate"], out2["ate"])
    # loose relative bound only: noisy-replay ATE diffs between two runs
    # that both track are chaotic (CLAUDE.md) — gate on "not much worse",
    # not on improvement (measured typical: 6.9 -> 5.4 mm)
    assert out2["ate"] <= out1["ate"] * 1.5 + 1e-3, \
        (out1["ate"], out2["ate"])


@pytest.mark.heavy
def test_e2e_batch_smoothing():
    """Pass-3 global batch smoothing (graph/refine.py over the wp-sharded
    distributed GN): re-solving the whole trajectory with each scan's
    absorbed pose quadratic + a re-preintegrated IMU chain must improve
    the fixed-lag result (early poses finally see later information)."""
    out = sr.run(t_total=6.0, verbose=False, seed=3, imu_noise=0.02,
                 range_noise=0.01, smooth=True, step_cache=_SC)
    assert out["ate_smooth"] < 0.05, out["ate_smooth"]
    # loose relative bound only (chaotic noisy-replay diffs, CLAUDE.md);
    # measured typical: 6.9 -> 5.2 mm
    assert out["ate_smooth"] <= out["ate"] * 1.5 + 1e-3, \
        (out["ate"], out["ate_smooth"])
