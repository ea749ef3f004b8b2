"""IMU-to-IMU extrinsic rotation + time-offset calibration.

Core algorithm of the reference's scripts/imu_calibration.py (660 LoC with
ROS glue): two rigidly-mounted IMUs observe the same angular velocity
expressed in their own frames, so

1. **time offset** — cross-correlate |gyro| magnitude signals,
2. **rotation** — Wahba's problem over time-aligned gyro vector pairs
   (SVD / Kabsch),
3. **lever arm** (optional) — least squares on
   a_2 = R^T a_1 + omega_dot x r + omega x (omega x r).

Library usage: ``calibrate(ts1, gyro1, acc1, ts2, gyro2, acc2)``.
CLI: two CSV/npz files with columns ts, gx, gy, gz, ax, ay, az.
"""

import argparse
import sys

import numpy as np


def _resample(ts, x, ts_ref):
    return np.stack([np.interp(ts_ref, ts, x[:, i]) for i in range(x.shape[1])],
                    axis=-1)


def estimate_time_offset(ts1, gyro1, ts2, gyro2, max_offset=1.0):
    """Cross-correlation of |gyro| at a common uniform rate. Returns the
    offset to ADD to ts2 so that the streams align."""
    rate = 1.0 / np.median(np.diff(ts1))
    t0 = max(ts1[0], ts2[0])
    t1 = min(ts1[-1], ts2[-1])
    tt = np.arange(t0, t1, 1.0 / rate)
    m1 = np.linalg.norm(_resample(ts1, gyro1, tt), axis=-1)
    m2 = np.linalg.norm(_resample(ts2, gyro2, tt), axis=-1)
    m1 = m1 - m1.mean()
    m2 = m2 - m2.mean()
    n = len(tt)
    max_lag = int(max_offset * rate)
    corr = np.correlate(m1, m2, "full")
    lags = np.arange(-n + 1, n)
    sel = np.abs(lags) <= max_lag
    lag = lags[sel][np.argmax(corr[sel])]
    # m2 resampled on the common grid equals the signal at t + dt, so the
    # correlation peaks at lag = dt * rate; adding +lag/rate to ts2 aligns
    return lag / rate


def estimate_rotation(ts1, gyro1, ts2, gyro2, dt2=0.0, min_rate=0.2):
    """Wahba / Kabsch over time-aligned gyro pairs: R such that
    gyro1 ~ R @ gyro2. Uses only samples with |omega| above min_rate."""
    tt = ts1[(ts1 >= ts2[0] + dt2) & (ts1 <= ts2[-1] + dt2)]
    g1 = _resample(ts1, gyro1, tt)
    g2 = _resample(ts2 + dt2, gyro2, tt)
    m = (np.linalg.norm(g1, axis=-1) > min_rate) & \
        (np.linalg.norm(g2, axis=-1) > min_rate)
    if m.sum() < 10:
        raise ValueError("not enough motion for rotation calibration")
    B = g1[m].T @ g2[m]
    U, _, Vt = np.linalg.svd(B)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = U @ S @ Vt
    resid = g1[m] - g2[m] @ R.T
    return R, float(np.sqrt((resid ** 2).sum(-1).mean()))


def estimate_lever_arm(ts1, gyro1, acc1, ts2, acc2, R, dt2=0.0):
    """Lever arm r (position of IMU2 in IMU1 frame) from
    a2 = R^T (a1 + omega_dot x r + omega x (omega x r))."""
    tt = ts1[(ts1 >= ts2[0] + dt2) & (ts1 <= ts2[-1] + dt2)][5:-5]
    g1 = _resample(ts1, gyro1, tt)
    a1 = _resample(ts1, acc1, tt)
    a2 = _resample(ts2 + dt2, acc2, tt)
    dt = np.gradient(tt)
    gdot = np.gradient(g1, axis=0) / dt[:, None]

    def hat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                         [-v[1], v[0], 0]])

    A_rows, b_rows = [], []
    for k in range(len(tt)):
        M = hat(gdot[k]) + hat(g1[k]) @ hat(g1[k])
        A_rows.append(M)
        b_rows.append(R @ a2[k] - a1[k])
    A = np.concatenate(A_rows)
    b = np.concatenate(b_rows)
    r, *_ = np.linalg.lstsq(A, b, rcond=None)
    return r


def calibrate(ts1, gyro1, acc1, ts2, gyro2, acc2, lever_arm=True):
    dt2 = estimate_time_offset(ts1, gyro1, ts2, gyro2)
    R, gyro_rmse = estimate_rotation(ts1, gyro1, ts2, gyro2, dt2)
    out = dict(time_offset_2_to_1=dt2, R_1_2=R, gyro_rmse=gyro_rmse)
    if lever_arm:
        try:
            out["lever_arm_m"] = estimate_lever_arm(ts1, gyro1, acc1, ts2,
                                                    acc2, R, dt2)
        except Exception as e:  # insufficient excitation
            out["lever_arm_error"] = str(e)
    return out


def _load(path):
    if path.endswith(".npz"):
        z = np.load(path)
        return z["ts"], z["gyro"], z["acc"]
    arr = np.loadtxt(path, delimiter=",", skiprows=1)
    return arr[:, 0], arr[:, 1:4], arr[:, 4:7]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("imu1")
    ap.add_argument("imu2")
    args = ap.parse_args()
    ts1, g1, a1 = _load(args.imu1)
    ts2, g2, a2 = _load(args.imu2)
    out = calibrate(ts1, g1, a1, ts2, g2, a2)
    print(f"time offset (add to imu2): {out['time_offset_2_to_1']:.6f} s")
    print(f"R_1_2:\n{out['R_1_2']}")
    print(f"gyro residual RMSE: {out['gyro_rmse']:.4f} rad/s")
    if "lever_arm_m" in out:
        print(f"lever arm [m]: {out['lever_arm_m']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
