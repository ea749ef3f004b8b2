import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import deskew as dk

G = jnp.asarray([0.0, 0.0, -9.81])


def test_static_scan_identity():
    """No motion -> deskew is the identity."""
    n = 500
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)))
    t_pts = jnp.asarray(rng.uniform(0.0, 0.1, size=n))
    m = 32
    imu_ts = jnp.linspace(0.0, 0.1, m)
    accs = jnp.tile(-G[None], (m, 1))  # stationary: specific force = -g
    gyros = jnp.zeros((m, 3))
    res = dk.deskew(pts, t_pts, jnp.ones(n, bool),
                    lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
                    accs, gyros, imu_ts, jnp.zeros(3), jnp.zeros(3), G,
                    lie.quat_identity(jnp.float64), jnp.zeros(3), 0.1)
    np.testing.assert_allclose(res.points_le, pts, atol=1e-9)
    np.testing.assert_allclose(res.p_w_be, 0.0, atol=1e-9)


def test_pure_rotation_deskew():
    """Constant yaw rate: a world-fixed point seen at time t must land at its
    scan-end viewing direction after deskew."""
    wz = 1.0  # rad/s yaw
    t_span = 0.1
    m = 64
    imu_ts = jnp.linspace(0.0, t_span, m)
    accs = jnp.tile(-G[None], (m, 1))  # gravity-compensated, no translation
    # NOTE: for pure rotation with non-aligned gravity this wouldn't be
    # stationary; keep rotation about gravity axis (yaw) so accs are constant
    gyros = jnp.tile(jnp.asarray([[0.0, 0.0, wz]]), (m, 1))

    p_world = jnp.asarray([3.0, 1.0, 0.5])
    # point observed at times t: p_L(t) = R_z(-wz t) p_world
    n = 200
    t_pts = jnp.linspace(0.0, t_span, n)
    qs = lie.exp_so3(jnp.stack([jnp.zeros(n), jnp.zeros(n), -wz * t_pts], -1))
    pts_lt = lie.quat_rotate(qs, jnp.broadcast_to(p_world, (n, 3)))

    res = dk.deskew(pts_lt, t_pts, jnp.ones(n, bool),
                    lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
                    accs, gyros, imu_ts, jnp.zeros(3), jnp.zeros(3), G,
                    lie.quat_identity(jnp.float64), jnp.zeros(3), t_span)
    # all deskewed points should coincide at the scan-end view of p_world
    p_le_expect = lie.quat_rotate(
        lie.exp_so3(jnp.asarray([0.0, 0.0, -wz * t_span])), p_world)
    err = jnp.linalg.norm(res.points_le - p_le_expect, axis=-1)
    assert float(jnp.max(err)) < 1e-6, float(jnp.max(err))


def test_constant_velocity_deskew():
    """Pure translation at constant velocity, gravity-compensated IMU."""
    v = jnp.asarray([2.0, 0.0, 0.0])
    t_span = 0.1
    m = 16
    imu_ts = jnp.linspace(0.0, t_span, m)
    accs = jnp.tile(-G[None], (m, 1))
    gyros = jnp.zeros((m, 3))
    p_world = jnp.asarray([5.0, 2.0, 1.0])
    n = 100
    t_pts = jnp.linspace(0.0, t_span, n)
    pts_lt = p_world[None] - v[None] * t_pts[:, None]  # body moves +x
    res = dk.deskew(pts_lt, t_pts, jnp.ones(n, bool),
                    lie.quat_identity(jnp.float64), jnp.zeros(3), v,
                    accs, gyros, imu_ts, jnp.zeros(3), jnp.zeros(3), G,
                    lie.quat_identity(jnp.float64), jnp.zeros(3), t_span)
    p_le_expect = p_world - v * t_span
    err = jnp.linalg.norm(res.points_le - p_le_expect, axis=-1)
    assert float(jnp.max(err)) < 1e-6
    np.testing.assert_allclose(res.p_w_be, v * t_span, atol=1e-9)


def test_extrinsics_roundtrip():
    """With a nontrivial T_B_L and zero motion, deskew must still be identity
    in the lidar frame."""
    q_bl = lie.exp_so3(jnp.asarray([0.1, 0.2, -0.3]))
    t_bl = jnp.asarray([0.5, -0.2, 0.1])
    n = 100
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)))
    t_pts = jnp.asarray(rng.uniform(0, 0.1, size=n))
    m = 8
    imu_ts = jnp.linspace(0.0, 0.1, m)
    res = dk.deskew(pts, t_pts, jnp.ones(n, bool),
                    lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
                    jnp.tile(-G[None], (m, 1)), jnp.zeros((m, 3)), imu_ts,
                    jnp.zeros(3), jnp.zeros(3), G, q_bl, t_bl, 0.1)
    np.testing.assert_allclose(res.points_le, pts, atol=1e-9)


def test_padded_imu_tail():
    """Padding convention: repeated last sample with ts >= t_end is a no-op."""
    n = 50
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)))
    t_pts = jnp.asarray(rng.uniform(0, 0.1, size=n))
    m = 8
    ts_a = jnp.linspace(0.0, 0.1, m)
    accs = jnp.asarray(rng.normal(size=(m, 3)))
    gyros = jnp.asarray(rng.normal(size=(m, 3)) * 0.3)
    args = (jnp.zeros(3), jnp.zeros(3), G, lie.quat_identity(jnp.float64),
            jnp.zeros(3), 0.1)
    r1 = dk.deskew(pts, t_pts, jnp.ones(n, bool),
                   lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
                   accs, gyros, ts_a, *args)
    pad = 5
    ts_b = jnp.concatenate([ts_a, jnp.full(pad, 1e9)])
    accs_b = jnp.concatenate([accs, jnp.tile(accs[-1:], (pad, 1))])
    gyros_b = jnp.concatenate([gyros, jnp.tile(gyros[-1:], (pad, 1))])
    r2 = dk.deskew(pts, t_pts, jnp.ones(n, bool),
                   lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
                   accs_b, gyros_b, ts_b, *args)
    np.testing.assert_allclose(r1.points_le, r2.points_le, atol=1e-12)
    np.testing.assert_allclose(r1.p_w_be, r2.p_w_be, atol=1e-12)
