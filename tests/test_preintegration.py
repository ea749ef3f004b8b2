import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.imu import preintegration as pre


G_MAG = 9.81


def simulate_imu(T=1.0, rate=200, seed=0, bg=None, ba=None):
    """Ground-truth trajectory with analytic body rates + gravity; returns
    measured (biased) IMU plus GT start/end states."""
    rng = np.random.default_rng(seed)
    n = int(T * rate)
    dt = 1.0 / rate
    g_world = np.array([0.0, 0.0, -G_MAG])
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba

    # piecewise-constant true body rates / world acceleration
    omegas = rng.normal(size=(n, 3)) * 0.8
    acc_w = rng.normal(size=(n, 3)) * 1.5

    q = np.array([1.0, 0.0, 0.0, 0.0])
    p = np.zeros(3)
    v = rng.normal(size=3) * 0.5
    qs, ps, vs = [q.copy()], [p.copy()], [v.copy()]
    accs_meas, gyro_meas = [], []
    for k in range(n):
        R = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
        a_body_specific = R.T @ (acc_w[k] - g_world)  # specific force
        accs_meas.append(a_body_specific + ba)
        gyro_meas.append(omegas[k] + bg)
        # integrate GT with the same first-order model the preint uses
        p = p + v * dt + 0.5 * acc_w[k] * dt * dt
        v = v + acc_w[k] * dt
        q = np.asarray(lie.quat_mul(jnp.asarray(q), lie.exp_so3(jnp.asarray(omegas[k] * dt))))
        qs.append(q.copy()); ps.append(p.copy()); vs.append(v.copy())

    return dict(
        accs=jnp.asarray(np.array(accs_meas)),
        gyros=jnp.asarray(np.array(gyro_meas)),
        dts=jnp.full(n, dt),
        q0=jnp.asarray(qs[0]), p0=jnp.asarray(ps[0]), v0=jnp.asarray(vs[0]),
        q1=jnp.asarray(qs[-1]), p1=jnp.asarray(ps[-1]), v1=jnp.asarray(vs[-1]),
    )


def test_preintegration_predict_matches_truth():
    d = simulate_imu()
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                          jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
    g = jnp.asarray([0.0, 0.0, -G_MAG])
    q1, p1, v1 = pre.predict(st, d["q0"], d["p0"], d["v0"], g)
    np.testing.assert_allclose(p1, d["p1"], atol=1e-6)
    np.testing.assert_allclose(v1, d["v1"], atol=1e-6)
    assert abs(float(jnp.abs(jnp.sum(q1 * d["q1"]))) - 1.0) < 1e-9


def test_residual_zero_at_truth():
    d = simulate_imu(seed=1)
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                          jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
    r = pre.residual(st, d["q0"], d["p0"], d["v0"], d["q1"], d["p1"], d["v1"],
                     jnp.zeros(3), jnp.zeros(3),
                     jnp.asarray([0.0, 0.0, -1.0]), G_MAG)
    np.testing.assert_allclose(r, 0.0, atol=1e-6)


def test_padding_mask_is_noop():
    d = simulate_imu(T=0.5, seed=2)
    n = d["accs"].shape[0]
    pad = 37
    accs = jnp.concatenate([d["accs"], jnp.ones((pad, 3)) * 99.0])
    gyros = jnp.concatenate([d["gyros"], jnp.ones((pad, 3)) * 99.0])
    dts = jnp.concatenate([d["dts"], jnp.ones(pad)])
    valid = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    a = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                         jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
    b = pre.preintegrate(accs, gyros, dts,
                         jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5, valid=valid)
    np.testing.assert_allclose(a.dp, b.dp, atol=1e-12)
    np.testing.assert_allclose(a.dq, b.dq, atol=1e-12)
    np.testing.assert_allclose(a.cov, b.cov, atol=1e-12)


def test_bias_correction_first_order():
    """correct_deltas at perturbed bias ≈ re-integration with that bias."""
    bg_true = np.array([0.004, -0.003, 0.002])
    ba_true = np.array([0.03, -0.02, 0.05])
    d = simulate_imu(seed=3, bg=bg_true, ba=ba_true)
    # integrate at zero bias linearization point
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                          jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
    # exact re-integration at the true bias
    st_exact = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                                jnp.asarray(bg_true), jnp.asarray(ba_true),
                                1e-4, 1e-5)
    dq_c, dv_c, dp_c = pre.correct_deltas(st, jnp.asarray(bg_true),
                                          jnp.asarray(ba_true))
    np.testing.assert_allclose(dv_c, st_exact.dv, atol=2e-3)
    np.testing.assert_allclose(dp_c, st_exact.dp, atol=2e-3)
    ang_err = np.linalg.norm(
        np.asarray(lie.log_so3(lie.quat_mul(lie.quat_conj(dq_c), st_exact.dq))))
    assert ang_err < 2e-4


def test_residual_jacobians_vs_numeric():
    d = simulate_imu(T=0.3, seed=4)
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                          jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
    g_dir = jnp.asarray([0.0, 0.0, -1.0])
    # perturb the end state so the residual is nonzero
    q1 = lie.quat_mul(d["q1"], lie.exp_so3(jnp.asarray([0.01, -0.02, 0.03])))
    lin = (d["q0"], d["p0"], d["v0"], q1, d["p1"] + 0.1, d["v1"] - 0.05,
           jnp.zeros(3), jnp.zeros(3), g_dir)
    f = pre.make_residual_fn(G_MAG)
    z9, z6, z2 = jnp.zeros(9), jnp.zeros(6), jnp.zeros(2)
    jac = jax.jacfwd(f, argnums=(0, 1, 2, 3))(z9, z9, z6, z2, st, lin)
    # numeric check on each block
    eps = 1e-6
    for argi, dim, Z in [(0, 9, z9), (1, 9, z9), (2, 6, z6), (3, 2, z2)]:
        for k in range(dim):
            dx = Z.at[k].set(eps)
            args_p = [z9, z9, z6, z2]
            args_m = [z9, z9, z6, z2]
            args_p[argi] = dx
            args_m[argi] = -dx
            rp = f(*args_p, st, lin)
            rm = f(*args_m, st, lin)
            num = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(jac[argi][:, k], num, atol=1e-5,
                                       err_msg=f"arg {argi} col {k}")


def test_covariance_psd_and_growing():
    d = simulate_imu(T=1.0, seed=5)
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"],
                          jnp.zeros(3), jnp.zeros(3), 1e-3, 1e-4)
    w = np.linalg.eigvalsh(np.asarray(st.cov))
    assert w.min() > -1e-12
    assert w.max() > 0


def test_associative_matches_sequential():
    """The associative-scan formulation must reproduce the sequential
    integration (deltas, bias Jacobians, covariance) to float tolerance."""
    d = simulate_imu(T=0.5, seed=11)
    n = d["accs"].shape[0]
    valid = jnp.ones(n, bool).at[-7:].set(False)  # include padding
    args = (d["accs"], d["gyros"], d["dts"], jnp.asarray([0.001, -0.002, 0.0005]),
            jnp.asarray([0.05, -0.03, 0.01]), 1e-3, 1e-5)
    a = pre.preintegrate_sequential(*args, valid=valid)
    b = pre.preintegrate(*args, valid=valid)
    np.testing.assert_allclose(b.dq, a.dq, atol=1e-10)
    np.testing.assert_allclose(b.dv, a.dv, atol=1e-10)
    np.testing.assert_allclose(b.dp, a.dp, atol=1e-10)
    np.testing.assert_allclose(float(b.dt), float(a.dt), atol=1e-12)
    for f in ("J_dr_bg", "J_dv_bg", "J_dv_ba", "J_dp_bg", "J_dp_ba"):
        np.testing.assert_allclose(getattr(b, f), getattr(a, f), atol=1e-8,
                                   err_msg=f)
    np.testing.assert_allclose(b.cov, a.cov, atol=1e-8, rtol=1e-4)


def test_prefixes_match_incremental():
    d = simulate_imu(T=0.2, seed=12)
    pref = pre.preintegrate(d["accs"], d["gyros"], d["dts"], jnp.zeros(3),
                            jnp.zeros(3), 1e-4, 1e-5, return_prefixes=True)
    # prefix k == sequential integration of the first k+1 samples
    for k in (0, 7, 19, d["accs"].shape[0] - 1):
        s = pre.preintegrate_sequential(
            d["accs"][:k + 1], d["gyros"][:k + 1], d["dts"][:k + 1],
            jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-5)
        np.testing.assert_allclose(pref.dp[k], s.dp, atol=1e-10)
        np.testing.assert_allclose(pref.dq[k], s.dq, atol=1e-10)


def test_imu_localizability():
    """Well-excited motion: all 9 dof observable (positive eigenvalues);
    ordering and shapes match the ref diagnostic (imu/manager.cpp:436-482)."""
    d = simulate_imu(T=0.5, seed=20)
    st = pre.preintegrate(d["accs"], d["gyros"], d["dts"], jnp.zeros(3),
                          jnp.zeros(3), 1e-4, 1e-5)
    out = pre.localizability(st, d["q0"], d["p0"], d["v0"], d["q1"],
                             d["p1"], d["v1"], jnp.zeros(3), jnp.zeros(3),
                             jnp.asarray([0.0, 0.0, -1.0]), G_MAG)
    for k in ("eig_rot", "eig_pos", "eig_vel"):
        e = np.asarray(out[k])
        assert e.shape == (3,)
        assert (e > 0).all(), (k, e)
        assert e[0] <= e[1] <= e[2]
    assert out["H"].shape == (9, 9)
    w = np.linalg.eigvalsh(np.asarray(out["H"]))
    assert w.min() > 0
