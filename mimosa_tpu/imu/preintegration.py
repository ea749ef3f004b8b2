"""Gravity-aware IMU preintegration as batched JAX scans.

TPU-native re-expression of the reference's IMU backbone
(reference src/imu/manager.cpp:381-426 driving GTSAM
``PreintegratedImuMeasurements`` plus the fork's ``ImuFactorWithGravity`` —
a 6-key factor (X_i, V_i, X_j, V_j, B_i, G) where the gravity *direction*
is itself a state on S^2; see reference README.md:16).

Design: the preintegrated deltas (dR, dv, dp) are gravity-independent
(Forster et al. preintegration on manifold); gravity enters only in the
residual's prediction, so the gravity Jacobian is analytic and cheap.
Measurements arrive as fixed-size padded arrays with a validity count so the
whole scan lives under jit with static shapes.

All math inherits input dtype (f32 in production, f64 in oracle tests).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mimosa_tpu.core import lie


class PreintState(NamedTuple):
    """Preintegrated IMU deltas between two states + bias Jacobians + cov.

    dq: [4] quat of DeltaR_ij; dv, dp: [3]; dt: scalar total time.
    J_*_bg / J_*_ba: [3,3] first-order Jacobians of the deltas wrt the gyro /
    accel bias linearization point. cov: [9,9] covariance of (dR, dv, dp).
    bg, ba: [3] the bias linearization point used during integration.
    """

    dq: jnp.ndarray
    dv: jnp.ndarray
    dp: jnp.ndarray
    dt: jnp.ndarray
    J_dr_bg: jnp.ndarray
    J_dv_bg: jnp.ndarray
    J_dv_ba: jnp.ndarray
    J_dp_bg: jnp.ndarray
    J_dp_ba: jnp.ndarray
    cov: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray


def init_preint(bg, ba, dtype=None):
    dtype = dtype or bg.dtype
    z3 = jnp.zeros((3, 3), dtype)
    return PreintState(
        dq=lie.quat_identity(dtype),
        dv=jnp.zeros(3, dtype),
        dp=jnp.zeros(3, dtype),
        dt=jnp.zeros((), dtype),
        J_dr_bg=z3, J_dv_bg=z3, J_dv_ba=z3, J_dp_bg=z3, J_dp_ba=z3,
        cov=jnp.zeros((9, 9), dtype),
        bg=bg.astype(dtype), ba=ba.astype(dtype),
    )


def _integrate_one(state: PreintState, acc, gyro, dt, acc_var, gyro_var,
                   int_var) -> PreintState:
    """Single-measurement preintegration update (Forster eq. 35-46 style)."""
    w = gyro - state.bg
    a = acc - state.ba
    dtype = state.dp.dtype

    dR_prev = lie.quat_to_mat(state.dq)      # R of Delta_ij so far
    dq_inc = lie.exp_so3(w * dt)
    Jr = lie.right_jacobian_so3(w * dt)
    a_rot = dR_prev @ a                      # acceleration in frame i

    dp = state.dp + state.dv * dt + 0.5 * a_rot * dt * dt
    dv = state.dv + a_rot * dt
    dq = lie.quat_mul(state.dq, dq_inc)

    # bias Jacobian propagation
    A = lie.hat(a)
    dR_inc_T = lie.quat_to_mat(dq_inc).T
    J_dr_bg = dR_inc_T @ state.J_dr_bg - Jr * dt
    J_dp_bg = state.J_dp_bg + state.J_dv_bg * dt - 0.5 * dR_prev @ A @ state.J_dr_bg * dt * dt
    J_dp_ba = state.J_dp_ba + state.J_dv_ba * dt - 0.5 * dR_prev * dt * dt
    J_dv_bg = state.J_dv_bg - dR_prev @ A @ state.J_dr_bg * dt
    J_dv_ba = state.J_dv_ba - dR_prev * dt

    # covariance propagation on (dR, dv, dp)
    eye = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((9, 9), dtype)
    F = F.at[0:3, 0:3].set(dR_inc_T)
    F = F.at[3:6, 0:3].set(-dR_prev @ A * dt)
    F = F.at[3:6, 3:6].set(eye)
    F = F.at[6:9, 0:3].set(-0.5 * dR_prev @ A * dt * dt)
    F = F.at[6:9, 3:6].set(eye * dt)
    F = F.at[6:9, 6:9].set(eye)
    G_g = jnp.zeros((9, 3), dtype).at[0:3, :].set(Jr * dt)
    G_a = jnp.zeros((9, 3), dtype)
    G_a = G_a.at[3:6, :].set(dR_prev * dt)
    G_a = G_a.at[6:9, :].set(0.5 * dR_prev * dt * dt)
    cov = (
        F @ state.cov @ F.T
        + G_g @ G_g.T * (gyro_var / jnp.maximum(dt, 1e-9))
        + G_a @ G_a.T * (acc_var / jnp.maximum(dt, 1e-9))
    )
    # position integration noise
    cov = cov.at[6:9, 6:9].add(jnp.eye(3, dtype=dtype) * int_var * dt)

    return PreintState(
        dq=dq, dv=dv, dp=dp, dt=state.dt + dt,
        J_dr_bg=J_dr_bg, J_dv_bg=J_dv_bg, J_dv_ba=J_dv_ba,
        J_dp_bg=J_dp_bg, J_dp_ba=J_dp_ba, cov=cov,
        bg=state.bg, ba=state.ba,
    )


def preintegrate_sequential(accs, gyros, dts, bg, ba, acc_var, gyro_var,
                            int_var=1e-8, valid=None) -> PreintState:
    """Reference implementation: preintegrate via sequential ``lax.scan``.

    Kept as the oracle for the associative-scan version (a 256-sample
    segment costs 256 serialized tiny steps on TPU; ``preintegrate`` runs
    the same math in log2(N) parallel rounds).
    """
    dtype = accs.dtype
    state0 = init_preint(bg.astype(dtype), ba.astype(dtype))
    if valid is None:
        valid = jnp.ones(accs.shape[0], bool)

    def step(state, inp):
        acc, gyro, dt, ok = inp
        new = _integrate_one(state, acc, gyro, dt, acc_var, gyro_var, int_var)
        out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, state
        )
        return out, None

    final, _ = jax.lax.scan(step, state0, (accs, gyros, dts, valid))
    return final


def _single_sample_elements(accs, gyros, dts, bg, ba, acc_var, gyro_var,
                            int_var, valid):
    """Per-sample preintegration elements (relative to each sample's own
    start frame) — the leaves of the associative composition. Invalid
    (padding) rows become exact identity elements."""
    dtype = accs.dtype
    n = accs.shape[0]
    w = gyros - bg
    a = accs - ba
    dt = jnp.where(valid, dts, 0.0)[:, None]
    dq = lie.exp_so3(w * dt)
    dv = a * dt
    dp = 0.5 * a * dt * dt
    Jr = lie.right_jacobian_so3(w * dt)
    z33 = jnp.zeros((n, 3, 3), dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
    dtc = dt[..., None]
    J_dr_bg = -Jr * dtc
    J_dv_ba = -eye * dtc
    J_dp_ba = -0.5 * eye * dtc * dtc
    # one-step covariance (F = I at segment start)
    gv = gyro_var / jnp.maximum(dt[:, 0], 1e-9)
    av = acc_var / jnp.maximum(dt[:, 0], 1e-9)
    cov = jnp.zeros((n, 9, 9), dtype)
    JrJrT = Jr @ jnp.swapaxes(Jr, -1, -2)
    cov = cov.at[:, 0:3, 0:3].set(JrJrT * (gv * dt[:, 0] ** 2)[:, None, None])
    cov = cov.at[:, 3:6, 3:6].set(eye * (av * dt[:, 0] ** 2)[:, None, None])
    cov = cov.at[:, 3:6, 6:9].set(
        eye * (av * 0.5 * dt[:, 0] ** 3)[:, None, None])
    cov = cov.at[:, 6:9, 3:6].set(
        eye * (av * 0.5 * dt[:, 0] ** 3)[:, None, None])
    cov = cov.at[:, 6:9, 6:9].set(
        eye * (av * 0.25 * dt[:, 0] ** 4 + int_var * dt[:, 0])[:, None, None])
    J = jnp.concatenate([
        jnp.concatenate([J_dr_bg, z33], axis=-1),
        jnp.concatenate([z33, J_dv_ba], axis=-1),
        jnp.concatenate([z33, J_dp_ba], axis=-1),
    ], axis=-2)                                     # [n, 9, 6]
    return dict(dq=dq, dv=dv, dp=dp, dt=dt[:, 0], J=J, cov=cov)


def _compose(a, b):
    """Associative composition of preintegration elements: a then b.

    Error-state transition of a's errors through b (derivation: expand
    DeltaR_a Exp(dphi_a) DeltaR_b Exp(dphi_b) etc. to first order):
      dphi = R_b^T dphi_a + dphi_b
      dv   = dv_a - R_a [Dv_b]x dphi_a + R_a dv_b
      dp   = dp_a + dv_a Dt_b - R_a [Dp_b]x dphi_a + R_a dp_b
    """
    Ra = lie.quat_to_mat(a["dq"])
    Rb = lie.quat_to_mat(b["dq"])
    dtype = a["dv"].dtype
    batch = a["dv"].shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    z = jnp.zeros(batch + (3, 3), dtype)
    RbT = jnp.swapaxes(Rb, -1, -2)
    dtb = b["dt"][..., None, None]
    F = jnp.concatenate([
        jnp.concatenate([RbT, z, z], axis=-1),
        jnp.concatenate([-Ra @ lie.hat(b["dv"]), eye, z], axis=-1),
        jnp.concatenate([-Ra @ lie.hat(b["dp"]), eye * dtb, eye], axis=-1),
    ], axis=-2)
    G = jnp.concatenate([
        jnp.concatenate([eye, z, z], axis=-1),
        jnp.concatenate([z, Ra, z], axis=-1),
        jnp.concatenate([z, z, Ra], axis=-1),
    ], axis=-2)
    Ft = jnp.swapaxes(F, -1, -2)
    Gt = jnp.swapaxes(G, -1, -2)
    return dict(
        dq=lie.quat_mul(a["dq"], b["dq"]),
        dv=a["dv"] + jnp.einsum("...ij,...j->...i", Ra, b["dv"]),
        dp=(a["dp"] + a["dv"] * b["dt"][..., None]
            + jnp.einsum("...ij,...j->...i", Ra, b["dp"])),
        dt=a["dt"] + b["dt"],
        J=F @ a["J"] + G @ b["J"],
        cov=F @ a["cov"] @ Ft + G @ b["cov"] @ Gt,
    )


def preintegrate(accs, gyros, dts, bg, ba, acc_var, gyro_var,
                 int_var=1e-8, valid=None, return_prefixes=False):
    """Preintegrate a padded batch of IMU samples via associative scan.

    Mathematically identical to ``preintegrate_sequential`` (integration
    over concatenated intervals is associative) but runs in log2(N)
    parallel combine rounds instead of N serialized steps — the
    TPU-shaped formulation. With ``return_prefixes`` the cumulative
    element after every sample is returned (leading dim N) — this is the
    deskew pose-replay primitive.
    """
    dtype = accs.dtype
    if valid is None:
        valid = jnp.ones(accs.shape[0], bool)
    elems = _single_sample_elements(accs, gyros, dts, bg.astype(dtype),
                                    ba.astype(dtype), acc_var, gyro_var,
                                    int_var, valid)
    pref = jax.lax.associative_scan(_compose, elems)
    J = pref["J"] if return_prefixes else pref["J"][-1]
    out = PreintState(
        dq=pref["dq"] if return_prefixes else pref["dq"][-1],
        dv=pref["dv"] if return_prefixes else pref["dv"][-1],
        dp=pref["dp"] if return_prefixes else pref["dp"][-1],
        dt=pref["dt"] if return_prefixes else pref["dt"][-1],
        J_dr_bg=J[..., 0:3, 0:3], J_dv_bg=J[..., 3:6, 0:3],
        J_dv_ba=J[..., 3:6, 3:6], J_dp_bg=J[..., 6:9, 0:3],
        J_dp_ba=J[..., 6:9, 3:6],
        cov=pref["cov"] if return_prefixes else pref["cov"][-1],
        bg=bg.astype(dtype), ba=ba.astype(dtype),
    )
    return out


def predict(pre: PreintState, q_i, p_i, v_i, gravity):
    """Forward prediction of state j from state i using the preintegration.

    gravity: full gravity vector in world (direction * magnitude), i.e. the
    acceleration of free fall expressed in world frame (typically
    ``g_dir * 9.81`` with g_dir pointing *down*).
    """
    dt = pre.dt
    R_i = lie.quat_to_mat(q_i)
    p_j = p_i + v_i * dt + 0.5 * gravity * dt * dt + R_i @ pre.dp
    v_j = v_i + gravity * dt + R_i @ pre.dv
    q_j = lie.quat_mul(q_i, pre.dq)
    return q_j, p_j, v_j


def correct_deltas(pre: PreintState, bg, ba):
    """First-order bias-corrected deltas at a new bias linearization point."""
    dbg = bg - pre.bg
    dba = ba - pre.ba
    dq = lie.quat_mul(pre.dq, lie.exp_so3(pre.J_dr_bg @ dbg))
    dv = pre.dv + pre.J_dv_bg @ dbg + pre.J_dv_ba @ dba
    dp = pre.dp + pre.J_dp_bg @ dbg + pre.J_dp_ba @ dba
    return dq, dv, dp


def residual(pre: PreintState, q_i, p_i, v_i, q_j, p_j, v_j, bg, ba, g_dir,
             g_mag):
    """9-dof gravity-aware preintegration residual (rotation, velocity, position).

    Equivalent of the fork's ImuFactorWithGravity error: the gravity direction
    ``g_dir`` (unit, pointing in the direction of gravitational acceleration,
    i.e. "down" in world frame) is a free variable; ``g_mag`` is fixed.

    Returns r [9] ordered (r_dR, r_dv, r_dp) in frame i.
    """
    gravity = g_dir * g_mag
    dq_c, dv_c, dp_c = correct_deltas(pre, bg, ba)
    dt = pre.dt
    R_i_T = lie.quat_to_mat(q_i).T

    dq_meas_inv = lie.quat_conj(dq_c)
    q_ij = lie.quat_mul(lie.quat_conj(q_i), q_j)
    r_dR = lie.log_so3(lie.quat_mul(dq_meas_inv, q_ij))
    r_dv = R_i_T @ (v_j - v_i - gravity * dt) - dv_c
    r_dp = R_i_T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp_c
    return jnp.concatenate([r_dR, r_dv, r_dp])


def localizability(pre: PreintState, q_i, p_i, v_i, q_j, p_j, v_j, bg, ba,
                   g_dir, g_mag):
    """Eigen-analysis of the whitened IMU-factor Hessian blocks — the
    reference's IMU localizability diagnostic (imu/manager.cpp:436-482):
    eigenvalues of the 9x9 information over the *second* state's
    (rot, vel, pos) tangent, ascending, plus eigenvectors.
    """
    import jax

    from mimosa_tpu.core.eigh3 import eigh3

    f = make_residual_fn(g_mag)
    dtype = p_i.dtype
    z9 = jnp.zeros(9, dtype)
    z6 = jnp.zeros(6, dtype)
    z2 = jnp.zeros(2, dtype)
    lin = (q_i, p_i, v_i, q_j, p_j, v_j, bg, ba, g_dir)
    Jj = jax.jacfwd(f, argnums=1)(z9, z9, z6, z2, pre, lin)
    cov = pre.cov + jnp.eye(9, dtype=dtype) * 1e-10
    L = jnp.linalg.cholesky(cov)
    Jw = jax.scipy.linalg.solve_triangular(L, Jj, lower=True)
    H = Jw.T @ Jw
    lam_r, V_r = eigh3(H[0:3, 0:3])
    lam_p, V_p = eigh3(H[3:6, 3:6])
    lam_v, V_v = eigh3(H[6:9, 6:9])
    return dict(eig_rot=lam_r, vec_rot=V_r, eig_pos=lam_p, vec_pos=V_p,
                eig_vel=lam_v, vec_vel=V_v, H=H)


def make_residual_fn(g_mag):
    """Residual as a function of tangent perturbations, for autodiff Jacobians.

    Returns ``f(xi_i, xi_j, xi_b, xi_g, pre, lin)`` where xi_i/xi_j are [9]
    navstate tangents, xi_b is [6] (bg, ba) tangent, xi_g is [2] S^2 tangent
    and ``lin`` is the linearization point tuple
    (q_i, p_i, v_i, q_j, p_j, v_j, bg, ba, g_dir).
    Jacobians come from jax.jacfwd of this closure — XLA fuses the whole
    9x(9+9+6+2) Jacobian into the same kernel as the residual, which on TPU
    is cheaper than maintaining hand-derived chained Jacobians.
    """

    def f(xi_i, xi_j, xi_b, xi_g, pre, lin):
        q_i, p_i, v_i, q_j, p_j, v_j, bg, ba, g_dir = lin
        s_i = lie.NavState(q_i, p_i, v_i).retract(xi_i)
        s_j = lie.NavState(q_j, p_j, v_j).retract(xi_j)
        bg2 = bg + xi_b[:3]
        ba2 = ba + xi_b[3:]
        g2 = lie.s2_retract(g_dir, xi_g)
        return residual(pre, s_i.q, s_i.p, s_i.v, s_j.q, s_j.p, s_j.v,
                        bg2, ba2, g2, g_mag)

    return f
