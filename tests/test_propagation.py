import numpy as np

from mimosa_tpu.imu.propagation import Propagator


G = np.array([0.0, 0.0, -9.81])


def test_stationary_propagation():
    prop = Propagator()
    prop.set_base_state(0.0, [1, 0, 0, 0], [0, 0, 0], [0, 0, 0],
                        [0, 0, 0], [0, 0, 0], [0, 0, -1.0])
    for k in range(1, 101):
        out = prop.add_imu(k * 0.005, -G, [0, 0, 0])
    q, p, v = out
    np.testing.assert_allclose(p, 0.0, atol=1e-9)
    np.testing.assert_allclose(v, 0.0, atol=1e-9)


def test_constant_acceleration():
    prop = Propagator()
    prop.set_base_state(0.0, [1, 0, 0, 0], [0, 0, 0], [0, 0, 0],
                        [0, 0, 0], [0, 0, 0], [0, 0, -1.0])
    a = np.array([1.0, 0, 0])
    for k in range(1, 201):
        out = prop.add_imu(k * 0.005, a - G, [0, 0, 0])
    q, p, v = out
    np.testing.assert_allclose(v, [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p, [0.5, 0, 0], atol=1e-2)


def test_catchup_replay():
    """Rebasing at an old timestamp must replay buffered newer samples."""
    prop = Propagator()
    prop.set_base_state(0.0, [1, 0, 0, 0], [0, 0, 0], [0, 0, 0],
                        [0, 0, 0], [0, 0, 0], [0, 0, -1.0])
    a = np.array([1.0, 0, 0])
    for k in range(1, 101):
        prop.add_imu(k * 0.005, a - G, [0, 0, 0])
    v_before = prop.v.copy()
    # rebase at t=0.25 with the true state at that time
    prop.set_base_state(0.25, [1, 0, 0, 0], [0.5 * 0.25**2, 0, 0],
                        [0.25, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, -1.0])
    # propagated state should be caught up to t=0.5 again
    assert abs(prop.ts - 0.5) < 1e-9
    np.testing.assert_allclose(prop.v, v_before, atol=1e-6)


def test_bias_correction():
    prop = Propagator()
    bg = np.array([0.01, -0.02, 0.005])
    prop.set_base_state(0.0, [1, 0, 0, 0], [0, 0, 0], [0, 0, 0],
                        bg, [0, 0, 0], [0, 0, -1.0])
    for k in range(1, 101):
        out = prop.add_imu(k * 0.005, -G, bg)  # gyro reads exactly the bias
    q, p, v = out
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-9)
