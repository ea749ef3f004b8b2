"""Host-side IMU ring buffer with interpolation and attitude initialization.

The inherently-serial, low-rate part of the reference's imu::Manager
(reference src/imu/manager.cpp:59-96 buffer, :238-357 interpolation,
:164-236 attitude estimation) kept on host in numpy: measurements arrive at
100-400 Hz one at a time — device dispatch per sample would be pure
overhead. The buffer emits fixed-size padded segments for the jitted
preintegration / deskew kernels.
"""

from __future__ import annotations

import numpy as np


class ImuBuffer:
    """Time-indexed ring buffer of (ts, acc[3], gyro[3]).

    * strictly monotonic timestamps enforced (ref imu/manager.cpp:62-96);
    * bounded duration: samples older than ``max_duration`` before the
      newest are pruned;
    * ``segment(t0, t1)`` returns padded arrays with linearly interpolated
      boundary samples at exactly t0 and t1 (ref :238-357 semantics).
    """

    def __init__(self, max_duration: float = 30.0, acc_scale: float = 1.0):
        self.max_duration = max_duration
        self.acc_scale = acc_scale
        self.ts = np.zeros(0)
        self.acc = np.zeros((0, 3))
        self.gyro = np.zeros((0, 3))
        self.num_rejected_nonmonotonic = 0

    def __len__(self):
        return len(self.ts)

    @property
    def t_first(self):
        return self.ts[0] if len(self.ts) else None

    @property
    def t_last(self):
        return self.ts[-1] if len(self.ts) else None

    def add(self, ts: float, acc, gyro) -> bool:
        if len(self.ts) and ts <= self.ts[-1]:
            self.num_rejected_nonmonotonic += 1
            return False
        self.ts = np.append(self.ts, ts)
        self.acc = np.vstack([self.acc, np.asarray(acc) * self.acc_scale])
        self.gyro = np.vstack([self.gyro, np.asarray(gyro)])
        cutoff = ts - self.max_duration
        if self.ts[0] < cutoff:
            k = np.searchsorted(self.ts, cutoff)
            self.ts = self.ts[k:]
            self.acc = self.acc[k:]
            self.gyro = self.gyro[k:]
        return True

    def covers(self, t0: float, t1: float, slack: float = 0.0) -> bool:
        return (len(self.ts) >= 2 and self.ts[0] <= t0 + slack
                and self.ts[-1] + slack >= t1)

    def count_between(self, t0: float, t1: float) -> int:
        """Number of raw samples in (t0, t1] (ref getNumMeasurementsBetween)."""
        return int(np.searchsorted(self.ts, t1, "right")
                   - np.searchsorted(self.ts, t0, "right"))

    def interpolate(self, t: float):
        """Linear interpolation (or nearest-extrapolation) at time t."""
        i = np.clip(np.searchsorted(self.ts, t), 1, len(self.ts) - 1)
        t0, t1 = self.ts[i - 1], self.ts[i]
        a = 0.0 if t1 == t0 else np.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return ((1 - a) * self.acc[i - 1] + a * self.acc[i],
                (1 - a) * self.gyro[i - 1] + a * self.gyro[i])

    def segment(self, t0: float, t1: float, max_n: int):
        """Padded measurement segment spanning [t0, t1].

        Returns (ts [max_n], acc [max_n,3], gyro [max_n,3], n_valid) where
        row 0 is the interpolated sample at t0, rows 1..n-2 the raw samples
        strictly inside (t0, t1), and row n-1 the interpolated sample at t1.
        Padding repeats the last row with ts = t1 (the deskew/preintegration
        convention: zero extra integration time).
        """
        assert t1 >= t0
        i0 = np.searchsorted(self.ts, t0, "right")
        i1 = np.searchsorted(self.ts, t1, "left")
        inner = slice(i0, i1)
        n_inner = i1 - i0
        if n_inner + 2 > max_n:
            # subsample uniformly to fit (should be sized to never trigger)
            keep = np.linspace(i0, i1 - 1, max_n - 2).astype(int)
        else:
            keep = np.arange(i0, i1)
        a0, g0 = self.interpolate(t0)
        a1, g1 = self.interpolate(t1)
        ts = np.concatenate([[t0], self.ts[keep], [t1]])
        acc = np.vstack([a0[None], self.acc[keep], a1[None]])
        gyro = np.vstack([g0[None], self.gyro[keep], g1[None]])
        n = len(ts)
        pad = max_n - n
        ts = np.concatenate([ts, np.full(pad, t1)])
        acc = np.vstack([acc, np.tile(acc[-1:], (pad, 1))])
        gyro = np.vstack([gyro, np.tile(gyro[-1:], (pad, 1))])
        dts = np.diff(ts, append=t1)
        valid = np.arange(max_n) < n - 1  # last real row has dt=0 anyway
        return ts, acc, gyro, np.maximum(dts, 0.0), valid, n

    def mean_measurements(self, t0: float, t1: float):
        """Mean (acc, gyro) over [t0, t1] (ref radar exposure gyro,
        src/radar/manager.cpp:55-76)."""
        i0 = np.searchsorted(self.ts, t0, "right")
        i1 = np.searchsorted(self.ts, t1, "left")
        a0, g0 = self.interpolate(t0)
        a1, g1 = self.interpolate(t1)
        accs = np.vstack([a0[None], self.acc[i0:i1], a1[None]])
        gyros = np.vstack([g0[None], self.gyro[i0:i1], g1[None]])
        return accs.mean(0), gyros.mean(0)


def estimate_attitude(buf: ImuBuffer, t: float, wait_secs: float,
                      g_mag: float, gravity_aligned: bool = True):
    """Stationary attitude + gyro-bias initialization
    (ref imu/manager.cpp:164-236).

    Returns None if not enough stationary buffer, else a dict with
    q_w_b (world<-body), bg, ba, g_dir (unit world gravity direction).

    gravity_aligned=True: world z is up; attitude from Wahba-1 acc<->+z.
    False: world frame = initial body frame (identity attitude), gravity
    direction estimated as -mean_acc.
    """
    if buf.t_first is None or t - buf.t_first < wait_secs:
        return None
    i0 = np.searchsorted(buf.ts, t - wait_secs, "right")
    i1 = np.searchsorted(buf.ts, t, "right")
    if i1 - i0 < 10:
        return None
    mean_acc = buf.acc[i0:i1].mean(0)
    mean_gyro = buf.gyro[i0:i1].mean(0)
    bg = mean_gyro.copy()
    if gravity_aligned:
        # rotation taking measured specific force to +z*g
        a = mean_acc / np.linalg.norm(mean_acc)
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(a, z)
        s = np.linalg.norm(v)
        c = float(np.dot(a, z))
        if s < 1e-9:
            q = np.array([1.0, 0, 0, 0]) if c > 0 else np.array([0.0, 1, 0, 0])
        else:
            axis = v / s
            ang = np.arctan2(s, c)
            q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        g_dir = np.array([0.0, 0.0, -1.0])
        # residual accelerometer bias in body frame. Pure numpy on purpose:
        # ONE eager device op here would both cost a ~25 ms RPC and flip
        # the tunneled session out of streamed dispatch for the rest of
        # the process (scripts/probe_poison_bisect.py).
        w, x, y_, z_ = q
        R = np.array([
            [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x * y_ - w * z_),
             2 * (x * z_ + w * y_)],
            [2 * (x * y_ + w * z_), 1 - 2 * (x * x + z_ * z_),
             2 * (y_ * z_ - w * x)],
            [2 * (x * z_ - w * y_), 2 * (y_ * z_ + w * x),
             1 - 2 * (x * x + y_ * y_)]])
        ba = mean_acc - R.T @ (z * g_mag)
    else:
        q = np.array([1.0, 0, 0, 0])
        g_dir = -mean_acc / np.linalg.norm(mean_acc)
        ba = mean_acc + g_dir * g_mag
    return dict(q_w_b=q, bg=bg, ba=ba, g_dir=g_dir, t=t)
