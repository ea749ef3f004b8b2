import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.odometry import factor as odo
from mimosa_tpu.radar import factor as rad


def make_radar_scene(seed=0, n=128, q_wb=None, v_w=None, bg=None,
                     omega=None, cfg=rad.RadarConfig()):
    rng = np.random.default_rng(seed)
    q_wb = lie.exp_so3(jnp.asarray([0.1, -0.2, 0.5])) if q_wb is None else q_wb
    v_w = jnp.asarray([1.5, -0.5, 0.2]) if v_w is None else v_w
    bg = jnp.zeros(3) if bg is None else bg
    omega = jnp.asarray([0.1, 0.05, -0.3]) if omega is None else omega
    dirs = rng.normal(size=(n, 3))
    dirs[:, 0] = np.abs(dirs[:, 0]) + 1.0   # forward-ish cone
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    # true doppler for static world: vr = -d . v_R
    dop = rad.residuals(q_wb, v_w, bg, omega, dirs, jnp.zeros(n), cfg)
    return q_wb, v_w, bg, omega, dirs, dop


def test_radar_residual_zero_at_truth():
    cfg = rad.RadarConfig(t_b_r=(0.1, 0.0, 0.05))
    q, v, bg, om, dirs, dop = make_radar_scene(cfg=cfg)
    r = rad.residuals(q, v, bg, om, dirs, dop, cfg)
    np.testing.assert_allclose(r, 0.0, atol=1e-12)


def test_radar_gn_recovers_velocity():
    cfg = rad.RadarConfig(t_b_r=(0.1, 0.0, 0.05))
    q, v_true, bg, om, dirs, dop = make_radar_scene(cfg=cfg)
    valid = jnp.ones(dirs.shape[0], bool)
    v = v_true + jnp.asarray([0.5, -0.3, 0.2])
    for _ in range(5):
        res = rad.linearize(q, v, bg, om, dirs, dop, valid, cfg)
        # solve only the velocity block (attitude/bias unobservable from one
        # radar frame alone — that coupling comes from the window)
        Hv = res.H[3:6, 3:6] + jnp.eye(3) * 1e-9
        dv = -jnp.linalg.solve(Hv, res.b[3:6])
        v = v + dv
    np.testing.assert_allclose(v, v_true, atol=1e-6)


def test_radar_jacobian_numeric():
    cfg = rad.RadarConfig(t_b_r=(0.2, -0.1, 0.05))
    q, v, bg, om, dirs, dop = make_radar_scene(n=16, cfg=cfg)
    dop = dop + 0.1  # nonzero residual

    def res_fn(xi):
        q2 = lie.quat_mul(q, lie.exp_so3(xi[:3]))
        return rad.residuals(q2, v + xi[3:6], bg + xi[6:9], om, dirs, dop,
                             cfg)

    J = jax.jacfwd(res_fn)(jnp.zeros(9))
    eps = 1e-6
    for k in range(9):
        dxp = jnp.zeros(9).at[k].set(eps)
        num = (res_fn(dxp) - res_fn(-dxp)) / (2 * eps)
        np.testing.assert_allclose(J[:, k], num, atol=1e-6)


def test_radar_robust_weight_downweights_outliers():
    cfg = rad.RadarConfig()
    q, v, bg, om, dirs, dop = make_radar_scene(cfg=cfg)
    n = dirs.shape[0]
    dop_bad = dop.at[:8].add(20.0)  # gross outliers
    valid = jnp.ones(n, bool)
    res_clean = rad.linearize(q, v, bg, om, dirs, dop, valid, cfg)
    res_noisy = rad.linearize(q, v, bg, om, dirs, dop_bad, valid, cfg)
    # velocity solve from the noisy set must stay near truth
    dv = jnp.linalg.solve(res_noisy.H[3:6, 3:6] + jnp.eye(3) * 1e-9,
                          -res_noisy.b[3:6])
    assert float(jnp.linalg.norm(dv)) < 0.12, float(jnp.linalg.norm(dv))
    del res_clean


def test_radar_target_filters():
    cfg = rad.RadarConfig(min_snr_db=10.0, min_range=1.0, max_range=20.0,
                          max_azimuth=0.5, max_elevation=0.5)
    pts = jnp.asarray([
        [5.0, 0.0, 0.0],     # good
        [0.5, 0.0, 0.0],     # too close
        [30.0, 0.0, 0.0],    # too far
        [1.0, 5.0, 0.0],     # azimuth out
        [1.0, 0.0, 5.0],     # elevation out
        [jnp.nan, 0.0, 0.0],  # nan
        [5.0, 0.1, 0.1],     # good
    ])
    snr = jnp.asarray([20.0, 20, 20, 20, 20, 20, 5.0])
    dirs, rng, valid = rad.filter_targets(pts, snr, cfg)
    np.testing.assert_array_equal(
        np.asarray(valid), [True, False, False, False, False, False, False])
    np.testing.assert_allclose(jnp.linalg.norm(dirs[0]), 1.0, atol=1e-6)


def test_odometry_between_zero_at_consistent_poses():
    cfg = odo.OdometryConfig(q_b_s=tuple(np.asarray(
        lie.exp_so3(jnp.asarray([0.1, 0.0, -0.2])))), t_b_s=(0.2, 0.1, 0.0))
    # body poses
    q_i = lie.exp_so3(jnp.asarray([0.0, 0.1, 0.3]))
    p_i = jnp.asarray([1.0, 2.0, 0.5])
    q_j = lie.exp_so3(jnp.asarray([0.05, 0.2, 0.5]))
    p_j = jnp.asarray([1.5, 2.2, 0.6])
    # sensor poses consistent with them: T_WS = T_WB * T_BS
    q_bs = jnp.asarray(cfg.q_b_s)
    t_bs = jnp.asarray(cfg.t_b_s)
    qs_i, ts_i = lie.se3_compose(q_i, p_i, q_bs, t_bs)
    qs_j, ts_j = lie.se3_compose(q_j, p_j, q_bs, t_bs)
    q_m, t_m = odo.relative_measurement(qs_i, ts_i, qs_j, ts_j, cfg)
    res = odo.linearize(q_i, p_i, q_j, p_j, q_m, t_m, cfg)
    np.testing.assert_allclose(res.b, 0.0, atol=1e-9)
    # H is PSD with rank 6 (relative constraint)
    w = np.linalg.eigvalsh(np.asarray(res.H))
    assert w.min() > -1e-9
    assert np.sum(w > 1e-6) == 6


def test_odometry_pulls_pose_to_measurement():
    cfg = odo.OdometryConfig()
    q_i, p_i = lie.quat_identity(jnp.float64), jnp.zeros(3)
    q_j_true = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.2]))
    p_j_true = jnp.asarray([1.0, 0.0, 0.0])
    q_m, t_m = q_j_true, p_j_true  # identity extrinsics, T_i = I
    q_j = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.1]))
    p_j = jnp.asarray([0.8, 0.1, 0.0])
    for _ in range(5):
        res = odo.linearize(q_i, p_i, q_j, p_j, q_m, t_m, cfg)
        # hold pose i fixed, update pose j
        Hjj = res.H[6:, 6:] + jnp.eye(6) * 1e-9
        dx = -jnp.linalg.solve(Hjj, res.b[6:])
        q_j, p_j = lie.se3_retract(q_j, p_j, dx)
    np.testing.assert_allclose(p_j, p_j_true, atol=1e-8)


def test_d_optimality_gate():
    good = np.eye(6) * 1e-4
    bad = np.diag([1e-4] * 5 + [10.0])
    assert odo.d_optimality(good) < 1e-3
    assert odo.d_optimality(bad) > odo.d_optimality(good)
