"""ImuBuffer storage semantics after the amortized-growth rewrite."""

import numpy as np

from mimosa_tpu.imu.buffer import ImuBuffer


def _filled(n=500, dt=0.005, max_duration=30.0):
    buf = ImuBuffer(max_duration=max_duration)
    ts = np.arange(n) * dt
    acc = np.random.default_rng(0).normal(size=(n, 3))
    gyro = np.random.default_rng(1).normal(size=(n, 3))
    return buf, ts, acc, gyro


def test_add_and_views():
    buf, ts, acc, gyro = _filled()
    for i in range(len(ts)):
        assert buf.add(ts[i], acc[i], gyro[i])
    assert len(buf) == len(ts)
    np.testing.assert_allclose(buf.ts, ts)
    np.testing.assert_allclose(buf.acc, acc)
    np.testing.assert_allclose(buf.gyro, gyro)
    assert buf.t_first == ts[0] and buf.t_last == ts[-1]


def test_monotonic_rejection():
    buf = ImuBuffer()
    assert buf.add(1.0, np.zeros(3), np.zeros(3))
    assert not buf.add(1.0, np.zeros(3), np.zeros(3))
    assert not buf.add(0.5, np.zeros(3), np.zeros(3))
    assert buf.num_rejected_nonmonotonic == 2
    assert len(buf) == 1


def test_add_batch_matches_add():
    buf1, ts, acc, gyro = _filled(800)
    for i in range(len(ts)):
        buf1.add(ts[i], acc[i], gyro[i])
    buf2 = ImuBuffer()
    # interleave duplicates that must be rejected
    ts_b = np.insert(ts, 100, ts[99])
    acc_b = np.insert(acc, 100, acc[99], axis=0)
    gyro_b = np.insert(gyro, 100, gyro[99], axis=0)
    n = buf2.add_batch(ts_b, acc_b, gyro_b)
    assert n == len(ts)
    assert buf2.num_rejected_nonmonotonic == 1
    np.testing.assert_allclose(buf2.ts, buf1.ts)
    np.testing.assert_allclose(buf2.acc, buf1.acc)
    np.testing.assert_allclose(buf2.gyro, buf1.gyro)


def test_duration_bound():
    buf = ImuBuffer(max_duration=1.0)
    for i in range(5000):
        buf.add(i * 0.005, np.zeros(3), np.zeros(3))
    # pruning is amortized (slide only when a chunk is stale), so allow
    # slack beyond the nominal bound, but the buffer must not grow O(total)
    assert buf.ts[-1] - buf.ts[0] < 3.0
    assert len(buf) < 1200


def test_setter_restore_roundtrip():
    """Checkpoint restore assigns ts/acc/gyro directly."""
    buf, ts, acc, gyro = _filled(300)
    for i in range(len(ts)):
        buf.add(ts[i], acc[i], gyro[i])
    saved = (buf.ts.copy(), buf.acc.copy(), buf.gyro.copy())
    buf2 = ImuBuffer()
    buf2.ts, buf2.acc, buf2.gyro = saved
    assert len(buf2) == 300
    np.testing.assert_allclose(buf2.ts, buf.ts)
    # continues accepting after restore
    assert buf2.add(buf.t_last + 0.01, np.ones(3), np.ones(3))
    assert len(buf2) == 301


def test_segment_into_matches_segment():
    """segment_into (the add_scan zero-allocation fast path) must be
    row-for-row identical (at f32) to segment()'s packed layout."""
    buf, ts, acc, gyro = _filled(400)
    buf.add_batch(ts, acc, gyro)
    for t0, t1, max_n in [(0.101, 0.302, 64), (0.0, 1.9951, 64),
                          (0.5001, 0.5002, 64),   # no inner samples
                          (0.1, 1.9, 32),          # subsample branch
                          (0.25, 0.25, 16)]:       # zero-length segment
        ts_s, acc_s, gyro_s, dts_s, valid_s, n_s = buf.segment(t0, t1, max_n)
        out = np.full((max_n, 8), np.nan, np.float32)
        n_i = buf.segment_into(t0, t1, out)
        assert n_i == n_s
        np.testing.assert_allclose(out[:, 0:3],
                                   acc_s.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(out[:, 3:6],
                                   gyro_s.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(out[:, 6], dts_s.astype(np.float32),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(out[:, 7] > 0.5, valid_s)
