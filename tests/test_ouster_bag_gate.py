"""Production-path gate with the REAL platform config: a synthetic
Ouster-format bag (staggered pixel-id point order, per-row destagger
shifts and beam altitudes derived from the real os_enwide.json metadata)
replayed through ``io.replay.replay_bag`` with the reference's own
``config/enwide/params.yaml`` — photometric enabled, exact sampling model
active — and gated on ATE (round-1 VERDICT item 5).

The image geometry is the real metadata subsampled 128x1024 -> 32x256 so
the CPU e2e stays tractable; the code path (CLI loader -> Ouster metadata
-> destagger/yaw-table/re-skew -> full multi-module scan step) is exactly
the production one.
"""

import json

import numpy as np
import pytest

from mimosa_tpu.io import synthetic as syn
from mimosa_tpu.io.rosbag_writer import (BagWriter, serialize_imu,
                                         serialize_ouster_cloud)

ENWIDE_YAML = "/root/reference/mimosa/config/enwide/params.yaml"
ENWIDE_META = "/root/reference/mimosa/config/enwide/os_enwide.json"
ROWS, COLS = 32, 256


def _derived_metadata(tmp_path):
    """Real ENWIDE OS-0 metadata subsampled to 32 rows / 256 columns."""
    with open(ENWIDE_META) as f:
        meta = json.load(f)
    bi = meta["beam_intrinsics"]
    alts = bi["beam_altitude_angles"][:: 128 // ROWS][:ROWS]
    shifts = meta["lidar_data_format"]["pixel_shift_by_row"]
    shifts = [int(round(s * COLS / 1024)) for s in
              shifts[:: 128 // ROWS][:ROWS]]
    out = {
        "beam_intrinsics": {
            "beam_altitude_angles": alts,
            "lidar_origin_to_beam_origin_mm":
                bi["lidar_origin_to_beam_origin_mm"],
        },
        "lidar_data_format": {
            "pixel_shift_by_row": shifts,
            "columns_per_frame": COLS,
            "pixels_per_column": ROWS,
        },
    }
    p = tmp_path / "os_derived.json"
    with open(p, "w") as f:
        json.dump(out, f)
    return str(p), alts, shifts


@pytest.mark.timeout(1800)
@pytest.mark.heavy
def test_enwide_config_ouster_bag_replay(tmp_path):
    meta_path, alts_deg, shifts = _derived_metadata(tmp_path)
    alts = np.radians(alts_deg)

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    data = syn.generate_ouster(world, tc, alts, shifts, n_cols=COLS,
                               seed=0, imu_noise=0.005, range_noise=0.005)

    bag = tmp_path / "ouster.bag"
    w = BagWriter(str(bag))
    events = [(t, "imu", k) for k, t in enumerate(data["imu"]["ts"])]
    for k, sc in enumerate(data["scans"]):
        events.append((sc["ts_header"] + sc["t_rel"].max() + 0.01,
                       "scan", k))
    events.sort()
    for t, kind, k in events:
        if kind == "imu":
            imu = data["imu"]
            w.write("/os_cloud_node/imu", "sensor_msgs/Imu", t,
                    serialize_imu(imu["ts"][k], imu["acc"][k],
                                  imu["gyro"][k]))
        else:
            sc = data["scans"][k]
            w.write("/os_cloud_node/points", "sensor_msgs/PointCloud2", t,
                    serialize_ouster_cloud(sc["ts_header"], sc["points"],
                                           sc["intensity"], sc["t_rel"],
                                           ring=sc["ring"]))
    w.close()

    from mimosa_tpu.io.replay import replay_bag

    s = replay_bag(str(bag), ENWIDE_YAML, "/os_cloud_node/imu",
                   "/os_cloud_node/points", ouster_metadata=meta_path,
                   max_scan_points=ROWS * COLS, verbose=False,
                   # shrink device shapes for the CPU e2e; the enwide
                   # params themselves (skip divisor, thresholds, FIR
                   # chain, lag...) are untouched
                   n_geo_points=4096, n_map_points=8192, n_gn_iters=3)

    # the exact Ouster sampling model must actually be active
    assert s.photo_cfg is not None and s.photo_cfg.exact_ouster
    assert s.photo_cfg.pixel_shift_by_row == tuple(shifts)
    assert s.cfg.geo_skip == 4          # enwide point_skip_divisor
    assert s.cfg.lag_secs == 0.5        # enwide smoother lag

    est = s.trajectory
    assert len(est) >= 20, len(est)
    est_ts = np.asarray([t for t, _, _ in est])
    est_p = np.asarray([p for _, p, _ in est])
    ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"], data["gt"]["pos"])
    assert ate < 0.08, f"ATE {ate:.3f} m on the enwide-config Ouster bag"

    # photometric features were detected AND tracked through the replay
    dbg = s.debug_records()
    assert dbg[5:, 12].max() > 5, "no photometric tracking in the replay"


@pytest.mark.timeout(1800)
@pytest.mark.heavy
def test_enwide_config_ouster_bag_replay_range_transfer(tmp_path):
    """The sensor-native range codec through the production bag CLI
    (--range-transfer): beam table from the Ouster metadata (incl. the
    affine lidar_origin_to_beam_origin term — the bag is generated with
    the same 27.67 mm offset its metadata declares), codec fidelity gate,
    full geo+photometric pipeline on int16 (range, t, intensity) lanes
    (VERDICT r3 item 6: the codec the bench crowns must be reachable
    from the real-config path)."""
    meta_path, alts_deg, shifts = _derived_metadata(tmp_path)
    alts = np.radians(alts_deg)
    with open(meta_path) as f:
        n_off = json.load(f)["beam_intrinsics"][
            "lidar_origin_to_beam_origin_mm"] * 1e-3

    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=4.0)
    data = syn.generate_ouster(world, tc, alts, shifts, n_cols=COLS,
                               seed=0, imu_noise=0.005, range_noise=0.005,
                               beam_offset_m=n_off)

    bag = tmp_path / "ouster_range.bag"
    w = BagWriter(str(bag))
    events = [(t, "imu", k) for k, t in enumerate(data["imu"]["ts"])]
    for k, sc in enumerate(data["scans"]):
        events.append((sc["ts_header"] + sc["t_rel"].max() + 0.01,
                       "scan", k))
    events.sort()
    for t, kind, k in events:
        if kind == "imu":
            imu = data["imu"]
            w.write("/os_cloud_node/imu", "sensor_msgs/Imu", t,
                    serialize_imu(imu["ts"][k], imu["acc"][k],
                                  imu["gyro"][k]))
        else:
            sc = data["scans"][k]
            w.write("/os_cloud_node/points", "sensor_msgs/PointCloud2", t,
                    serialize_ouster_cloud(sc["ts_header"], sc["points"],
                                           sc["intensity"], sc["t_rel"],
                                           ring=sc["ring"]))
    w.close()

    from mimosa_tpu.io.replay import replay_bag

    s = replay_bag(str(bag), ENWIDE_YAML, "/os_cloud_node/imu",
                   "/os_cloud_node/points", ouster_metadata=meta_path,
                   max_scan_points=ROWS * COLS, verbose=False,
                   n_geo_points=4096, n_map_points=8192, n_gn_iters=3,
                   range_transfer=True)

    assert s.cfg.range_transfer
    assert s._ray_dirs is not None and s._ray_dirs.shape[1] == 6
    assert s.photo_cfg is not None          # geo+photo on ncol=3 lanes

    est = s.trajectory
    assert len(est) >= 20, len(est)
    est_ts = np.asarray([t for t, _, _ in est])
    est_p = np.asarray([p for _, p, _ in est])
    ate = syn.ate_rmse(est_ts, est_p, data["gt"]["ts"], data["gt"]["pos"])
    assert ate < 0.08, f"ATE {ate:.3f} m (range codec, enwide config)"


def test_range_transfer_refuses_mismatched_cloud(tmp_path):
    """A bag whose cloud does NOT follow the metadata's reconstruction
    model (here: generated withOUT the 27.67 mm beam-origin offset the
    metadata declares) must be refused by the fidelity gate, not silently
    decoded into a corrupted cloud."""
    meta_path, alts_deg, shifts = _derived_metadata(tmp_path)
    alts = np.radians(alts_deg)
    world = syn.room_world()
    tc = syn.TrajectoryConfig(t_total=1.6)
    data = syn.generate_ouster(world, tc, alts, shifts, n_cols=COLS,
                               seed=0)       # radial model, offset 0
    bag = tmp_path / "ouster_bad.bag"
    w = BagWriter(str(bag))
    for k, t in enumerate(data["imu"]["ts"]):
        imu = data["imu"]
        w.write("/os_cloud_node/imu", "sensor_msgs/Imu", t,
                serialize_imu(imu["ts"][k], imu["acc"][k],
                              imu["gyro"][k]))
    for sc in data["scans"]:
        w.write("/os_cloud_node/points", "sensor_msgs/PointCloud2",
                sc["ts_header"] + sc["t_rel"].max() + 0.01,
                serialize_ouster_cloud(sc["ts_header"], sc["points"],
                                       sc["intensity"], sc["t_rel"],
                                       ring=sc["ring"]))
    w.close()

    from mimosa_tpu.io.replay import replay_bag

    with pytest.raises(ValueError, match="reconstruction residual"):
        replay_bag(str(bag), ENWIDE_YAML, "/os_cloud_node/imu",
                   "/os_cloud_node/points", ouster_metadata=meta_path,
                   max_scan_points=ROWS * COLS, verbose=False,
                   range_transfer=True)
