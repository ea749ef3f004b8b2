"""The PG-LIO corridor scenario end-to-end (the ENWIDE tunnel_* analogue):
translation along the corridor is geometrically unobservable; the
photometric intensity texture must pin it.

Measured hierarchy this test locks in (8 s corridor, noisy IMU):
- geometric-only, no degeneracy projection: RUNAWAY (~25 m ATE) — the
  spurious x-information from thousands of noise-tilted wall planes
  anchors the pose to the stale map and feeds back;
- geometric-only + degeneracy projection: honest IMU-grade drift (~3 m);
- geometric+photometric + both projections: ~0.3 m — the texture pins x
  (ref PG-LIO, photometric.cpp degeneracy-aware features +
  geometric_factor.hpp:477-557 projection)."""

import numpy as np
import pytest

from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.io import synthetic_replay as sr


@pytest.fixture(scope="module")
def corridor():
    world = syn.corridor_world()
    tc = syn.TrajectoryConfig(t_total=8.0, amp=(4.0, 0.6, 0.3),
                              center=(40.0, 2.0, 1.5), yaw_rate=0.15)
    return dict(world=world, tc=tc, seed=0, imu_noise=0.01,
                range_noise=0.005, verbose=False)


def test_corridor_degeneracy_is_detected(corridor):
    out = sr.run(project_degenerate=True, **corridor)
    rec = out["sequencer"].debug_records()
    # one translation eigen-axis degenerate on essentially every scan
    assert rec[3:, 9:12].max(-1).mean() > 0.9
    # projection keeps the estimator at honest IMU-drift scale instead of
    # the spurious-anchor runaway (~25 m)
    assert out["ate"] < 10.0


def test_corridor_photometric_pins_translation(corridor):
    out = sr.run(use_photometric=True, project_on_degeneracy=True,
                 project_degenerate=True, **corridor)
    rec = out["sequencer"].debug_records()
    assert int(np.median(rec[3:, 12])) > 15, "photometric tracking died"
    assert out["ate"] < 0.8, \
        f"texture failed to pin the corridor axis: ATE {out['ate']:.2f} m"


def test_corridor_photometric_beats_geometric(corridor):
    """The comparative PG-LIO claim, asserted with wide margins."""
    ate_geo = sr.run(project_degenerate=True, **corridor)["ate"]
    ate_pglio = sr.run(use_photometric=True, project_on_degeneracy=True,
                       project_degenerate=True, **corridor)["ate"]
    assert ate_pglio < 0.5 * ate_geo
