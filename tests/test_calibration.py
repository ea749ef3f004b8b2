import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from imu_calibration import calibrate  # noqa: E402


def test_imu_calibration_recovers_extrinsics():
    rng = np.random.default_rng(0)
    rate = 200.0
    T = 20.0
    ts1 = np.arange(0, T, 1 / rate)
    # smooth random angular velocity with real excitation
    t = ts1[:, None]
    gyro1 = np.concatenate([
        0.8 * np.sin(2 * np.pi * 0.3 * t + 0.5),
        0.6 * np.sin(2 * np.pi * 0.5 * t + 1.1),
        0.7 * np.sin(2 * np.pi * 0.23 * t + 2.0)], axis=1)
    acc1 = np.concatenate([
        1.0 * np.sin(2 * np.pi * 0.4 * t),
        0.8 * np.cos(2 * np.pi * 0.6 * t),
        9.81 + 0.5 * np.sin(2 * np.pi * 0.2 * t)], axis=1)

    # true extrinsics: known rotation + time offset
    ang = np.deg2rad(25.0)
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0],
                       [0, 0, 1.0]])
    dt_true = 0.035
    ts2 = ts1 - dt_true   # imu2 clock lags; offset to ADD to ts2 is +dt
    gyro2 = gyro1 @ R_true      # gyro1 = R @ gyro2
    acc2 = acc1 @ R_true
    gyro2 = gyro2 + rng.normal(size=gyro2.shape) * 1e-3

    out = calibrate(ts1, gyro1, acc1, ts2, gyro2, acc2, lever_arm=False)
    assert abs(out["time_offset_2_to_1"] - dt_true) < 0.006, \
        out["time_offset_2_to_1"]
    # R_1_2 maps gyro2 into frame 1
    err = np.linalg.norm(out["R_1_2"] - R_true)
    assert err < 0.02, err
    assert out["gyro_rmse"] < 0.05
