import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre

G_MAG = 9.81
CFG = win.WindowConfig(K=5, damping=1e-9)


def stack_preints(plist):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *plist)


def simulate(T=2.0, imu_rate=200, state_rate=10, seed=0):
    """GT trajectory + IMU segments between states."""
    rng = np.random.default_rng(seed)
    n_seg = int(T * state_rate)
    per = imu_rate // state_rate
    dt = 1.0 / imu_rate
    g_w = np.array([0.0, 0.0, -G_MAG])
    q = np.array([1.0, 0, 0, 0]); p = np.zeros(3); v = np.array([0.5, 0, 0])
    states = [(q.copy(), p.copy(), v.copy())]
    segs = []
    for s in range(n_seg):
        accs, gyrs = [], []
        for k in range(per):
            w_b = np.array([0.1, -0.05, 0.4]) + 0.3 * np.sin(
                2 * np.pi * (s * per + k) / 100.0)
            a_w = np.array([0.3, 0.2, 0.1]) * np.cos(
                2 * np.pi * (s * per + k) / 150.0)
            R = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
            accs.append(R.T @ (a_w - g_w))
            gyrs.append(w_b)
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            q = np.asarray(lie.quat_mul(jnp.asarray(q),
                                        lie.exp_so3(jnp.asarray(w_b * dt))))
        segs.append((np.array(accs), np.array(gyrs)))
        states.append((q.copy(), p.copy(), v.copy()))
    return states, segs, dt


def run_fusion(states, segs, dt, meas_noise=0.0, seed=1,
               wrong_gravity=False, dtype=jnp.float64, cfg=None):
    CFG = cfg or globals()["CFG"]
    rng = np.random.default_rng(seed)
    K = CFG.K
    w = win.create(CFG, dtype=dtype)
    q0, p0, v0 = states[0]
    arr = lambda x: jnp.asarray(x, dtype)
    if wrong_gravity:
        w = w._replace(g_dir=lie.s2_retract(w.g_dir, arr([0.03, -0.02])),
                       lin_g=lie.s2_retract(w.g_dir, arr([0.03, -0.02])))
    w = win.append_state(w, arr(q0), arr(p0), arr(v0),
                         jnp.zeros(3, dtype), jnp.zeros(3, dtype), 0.0)
    w = win.init_priors(w, CFG)

    preint_chain = [pre.init_preint(jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                                    dtype) for _ in range(K - 1)]
    n_active = 1
    results = []
    for s, (accs, gyrs) in enumerate(segs):
        st = pre.preintegrate(arr(accs), arr(gyrs),
                              jnp.full(len(accs), dt, dtype),
                              jnp.zeros(3, dtype),
                              jnp.zeros(3, dtype), 1e-4, 1e-5)
        # slide if full
        if n_active == K:
            w = win.marginalize_oldest(w, stack_preints(preint_chain), CFG)
            preint_chain = preint_chain[1:] + [st]
            n_active -= 1
        else:
            preint_chain[n_active - 1] = st
        # predict + append
        last = n_active - 1
        qn, pn, vn = pre.predict(st, w.q[last], w.p[last], w.v[last],
                                 w.g_dir * G_MAG)
        w = win.append_state(w, qn, pn, vn, w.bg[last], w.ba[last],
                             (s + 1) / 10.0)
        n_active += 1

        # pose measurement of the new state (like an ICP result)
        q_gt, p_gt, _ = states[s + 1]
        q_m = arr(q_gt)
        p_m = arr(p_gt + rng.normal(size=3) * meas_noise)
        slot = n_active - 1
        wgt = 1.0 / max(meas_noise, 1e-3) ** 2

        fv = jnp.asarray([i < n_active - 1 for i in range(K - 1)])
        preints = stack_preints(preint_chain)
        for _ in range(3):
            r0 = lie.se3_local(q_m, p_m, w.q[slot], w.p[slot])
            H6 = jnp.eye(6, dtype=dtype) * wgt
            b6 = wgt * r0
            H, rhs = win.build_system(w, preints, fv, CFG,
                                      meas=[(win.pose_idx(slot), H6, b6)])
            dx = win.solve(H, rhs)
            w = win.apply_update(w, dx, CFG)
        # absorb the measurement into the prior
        w = win.rebase_prior(w, CFG)
        r0 = lie.se3_local(q_m, p_m, w.q[slot], w.p[slot])
        w = win.add_measurement_block(w, win.pose_idx(slot),
                                      jnp.eye(6, dtype=dtype) * wgt,
                                      wgt * r0, CFG)
        results.append((np.asarray(w.q[slot]), np.asarray(w.p[slot]),
                        np.asarray(w.v[slot])))
    return w, results


@pytest.mark.heavy
def test_window_tracks_trajectory():
    states, segs, dt = simulate()
    w, results = run_fusion(states, segs, dt, meas_noise=0.01)
    errs_p, errs_v = [], []
    for (q_e, p_e, v_e), (q_g, p_g, v_g) in zip(results, states[1:]):
        errs_p.append(np.linalg.norm(p_e - p_g))
        errs_v.append(np.linalg.norm(v_e - v_g))
    assert np.mean(errs_p) < 0.03, np.mean(errs_p)
    # velocity is never measured directly: it must come from fusion
    assert np.mean(errs_v[5:]) < 0.05, np.mean(errs_v)


@pytest.mark.heavy
def test_window_estimates_gravity():
    states, segs, dt = simulate(T=3.0)
    w, _ = run_fusion(states, segs, dt, meas_noise=0.005, wrong_gravity=True)
    g_est = np.asarray(w.g_dir)
    err = np.arccos(np.clip(-g_est[2], -1, 1))
    assert err < 0.01, f"gravity direction error {err} rad"


@pytest.mark.heavy
def test_marginalization_keeps_information():
    """After sliding far beyond K, estimates must not drift from GT
    (the prior carries the marginalized information)."""
    states, segs, dt = simulate(T=4.0)
    w, results = run_fusion(states, segs, dt, meas_noise=0.01)
    tail = results[-10:]
    errs = [np.linalg.norm(p_e - p_g)
            for (q_e, p_e, _), (_, p_g, __) in zip(tail, states[-10:])]
    assert np.mean(errs) < 0.03


def test_inactive_slots_untouched():
    w = win.create(CFG, dtype=jnp.float64)
    w = win.append_state(w, lie.quat_identity(jnp.float64), jnp.zeros(3),
                         jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), 0.0)
    w = win.init_priors(w, CFG)
    preints = stack_preints([pre.init_preint(jnp.zeros(3), jnp.zeros(3),
                                             jnp.float64)
                             for _ in range(CFG.K - 1)])
    fv = jnp.zeros(CFG.K - 1, bool)
    H, rhs = win.build_system(w, preints, fv, CFG)
    dx = win.solve(H, rhs)
    w2 = win.apply_update(w, dx, CFG)
    # inactive slots stay exactly at identity
    np.testing.assert_allclose(w2.q[1:], w.q[1:], atol=0)
    np.testing.assert_allclose(w2.p[1:], w.p[1:], atol=0)
    assert not np.any(np.isnan(np.asarray(dx)))


def test_solve_ill_conditioned_f32():
    """Regression: a PD system mixing ~1e7 prior information with ~1e-1
    velocity information (condition ~1e10, observed on a tracking-loss
    replay) must solve accurately in f32 — the raw Cholesky NaN'd and
    poisoned the window permanently. The equilibrated solve must stay
    finite and match the f64 solution."""
    rng = np.random.default_rng(0)
    n = 90
    scales = 10.0 ** rng.uniform(-1, 7, n)
    A = rng.standard_normal((n, n))
    H64 = A @ A.T / n + np.eye(n)
    H64 = H64 * np.outer(scales, scales) ** 0.5
    rhs64 = rng.standard_normal(n) * scales ** 0.5
    assert np.linalg.cond(H64) > 1e8
    dx64 = np.linalg.solve(H64, rhs64)
    dx32 = np.asarray(win.solve(jnp.asarray(H64, jnp.float32),
                                jnp.asarray(rhs64, jnp.float32)))
    assert np.all(np.isfinite(dx32))
    denom = np.linalg.norm(dx64)
    assert np.linalg.norm(dx32 - dx64) / denom < 1e-2


@pytest.mark.heavy
def test_marginalize_loose_bias_prior_f32():
    """Regression: with the reference's own ENWIDE sigmas (tight rotation
    prior 0.01 deg -> info ~3e7, LOOSE accel bias prior sigma 1.0 -> info 1)
    the raw-scale f32 Schur complement in marginalize_oldest leaked O(1)
    absolute rounding error from the huge pose rows into the tiny bias
    block, flipping the marginal prior indefinite and running the bias
    estimate away (6.7 m/s^2 by scan 16 on a corridor replay; f64 was
    clean). The equilibrated-basis Schur + iterative refinement must keep
    f32 marginalization consistent with f64: biases bounded, marginal
    prior PSD, trajectory matching the f64 run. (Measured residual f32-f64
    gap: a bounded ~3 cm transient at scan ~5 while the loose bias prior
    leaves the early window barely determined, decaying to ~3 mm; both
    runs' errors vs ground truth are statistically identical. The bug gave
    METERS and did not decay — gate on bounded + decaying.)"""
    cfg = win.WindowConfig(
        K=5, damping=1e-9,
        init_sigma_rot=float(np.radians(0.01)), init_sigma_pos=1e-3,
        init_sigma_vel=1e-3, init_sigma_bg=0.035, init_sigma_ba=1.0)
    states, segs, dt = simulate(T=4.0)
    w32, res32 = run_fusion(states, segs, dt, meas_noise=0.01,
                            dtype=jnp.float32, cfg=cfg)
    w64, res64 = run_fusion(states, segs, dt, meas_noise=0.01,
                            dtype=jnp.float64, cfg=cfg)
    # biases must stay physically sane (the bug ran |ba| to >5 m/s^2)
    assert np.max(np.abs(np.asarray(w32.ba))) < 0.5, np.asarray(w32.ba)
    # marginal prior must stay (near-)PSD: strongly negative eigenvalues
    # act as anti-measurements and destabilize every later solve
    Hp = np.asarray(w32.H_prior, np.float64)
    eigs = np.linalg.eigvalsh((Hp + Hp.T) / 2)
    assert eigs.min() > -1e-3 * max(eigs.max(), 1.0), eigs.min()
    # f32 trajectory must match f64 (same data, same config): bounded
    # everywhere, converged (not drifting) in steady state
    gaps = [np.linalg.norm(p32 - p64)
            for (_, p32, _), (_, p64, _) in zip(res32, res64)]
    assert np.max(gaps) < 0.05, np.max(gaps)
    assert np.max(gaps[len(gaps) // 2:]) < 0.01, gaps[len(gaps) // 2:]


def test_solve_singular_degrades_to_zero():
    """A truly broken system (NaN rhs) must yield a zero-ish finite update,
    never NaN: the sequencer holds the IMU prediction and keeps running."""
    H = jnp.eye(10, dtype=jnp.float32)
    rhs = jnp.full(10, jnp.nan, jnp.float32)
    dx = np.asarray(win.solve(H, rhs))
    assert np.all(np.isfinite(dx))
