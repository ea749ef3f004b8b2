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

# heavy tier: full CPU e2e replays, minutes each — the default CI gate runs -m 'not heavy'
pytestmark = pytest.mark.heavy


# shared across every sr.run of the module: the repeated-config replays
# (photometric_beats_geometric re-runs both configs the earlier tests
# already compiled) then reuse programs instead of recompiling
_STEP_CACHE = {}


@pytest.fixture(scope="module")
def corridor():
    world = syn.corridor_world()
    tc = syn.TrajectoryConfig(t_total=8.0, amp=(4.0, 0.6, 0.3),
                              center=(40.0, 2.0, 1.5), yaw_rate=0.15)
    return dict(world=world, tc=tc, seed=0, imu_noise=0.01,
                range_noise=0.005, verbose=False,
                step_cache=_STEP_CACHE)


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


def test_corridor_radar_pins_velocity(corridor):
    """The DR-LRIO claim (degradation-resilient LiDAR-radar-inertial,
    ICRA 2024): radar Doppler observes body velocity directly, so the
    drift along the geometrically unobservable axis collapses from
    IMU-integration scale (~3 m) to near-clean (~2 cm measured)."""
    import jax.numpy as jnp

    from mimosa_tpu.graph import sequencer as seq
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.io.synthetic import (LidarModel, ate_rmse,
                                         generate, generate_radar,
                                         make_trajectory)
    from mimosa_tpu.lidar import geometric as geo
    from mimosa_tpu.mapping import voxel_hash as vh

    lm = LidarModel()
    data = generate(corridor["world"], corridor["tc"], lm, seed=0,
                    imu_noise=0.01, range_noise=0.005)
    radar = generate_radar(make_trajectory(corridor["tc"]), corridor["tc"],
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
    events = [(t, 0, "imu", k) for k, t in enumerate(data["imu"]["ts"])]
    for k, sc in enumerate(data["scans"]):
        events.append((sc["ts_header"] + sc["t_rel"].max() + 0.031, 2,
                       "scan", k))
    for k, fr in enumerate(radar):
        events.append((fr["ts"] + 0.031, 1, "radar", k))
    events.sort(key=lambda e: (e[0], e[1]))
    imu = data["imu"]
    for _, _, kind, k in events:
        if kind == "imu":
            s.add_imu(imu["ts"][k], imu["acc"][k], imu["gyro"][k])
        elif kind == "scan":
            sc = data["scans"][k]
            s.add_scan(sc["ts_header"], sc["points"], sc["t_rel"],
                       sc["valid"])
        else:
            fr = radar[k]
            s.add_radar(fr["ts"], fr["points"], fr["doppler"], fr["snr_db"])
    est_t = np.asarray([t for t, _, _ in s.trajectory])
    est_p = np.asarray([p for _, p, _ in s.trajectory])
    ate = ate_rmse(est_t, est_p, data["gt"]["ts"], data["gt"]["pos"])
    assert ate < 0.2, f"radar failed to pin corridor drift: {ate:.3f} m"
