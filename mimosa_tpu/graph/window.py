"""Dense sliding-window Gauss-Newton fusion core.

TPU-native replacement for the reference's graph::Manager +
``gtsam::IncrementalFixedLagSmoother``/iSAM2 (reference
src/graph/manager.cpp:45-93,138-499,578-620). Instead of incremental
factor-graph surgery, the window is a dense block state

    x = [ state_0 (15) | state_1 (15) | ... | state_{K-1} (15) | g (2) ]

with per-state tangent [dR(3), dp(3), dv(3), dbg(3), dba(3)] and a shared
2-dof gravity direction. The window size K is static so everything —
factor linearization, assembly, Cholesky solve, retraction — lives in one
jit program. The fixed-lag behavior is reproduced by Schur-complement
marginalization of the oldest state into a dense Gaussian prior anchored
at per-state linearization points (replacing iSAM2 factor removal,
SURVEY.md §7), and measurements (ICP / radar / odometry Hessian blocks)
are absorbed into that prior once their scan is finalized.

The window is tiny (K*15+2 <= ~250 dof) — the expensive work is the
residual/Jacobian kernels feeding it, which is exactly the TPU-friendly
split.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mimosa_tpu.core import lie
from mimosa_tpu.imu import preintegration as pre

SD = 15  # per-state tangent dim


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    K: int = 8                         # max states in window
    g_mag: float = 9.81
    damping: float = 1e-6              # LM damping added to H diagonal
    # bias random walk densities (sigma * sqrt(dt) between-factor,
    # ref imu/manager.cpp:407-426)
    sigma_bg_rw: float = 1e-4
    sigma_ba_rw: float = 1e-3
    # initial priors (ref graph/manager.cpp:637-694 SmootherConfig sigmas)
    init_sigma_rot: float = 0.05
    init_sigma_pos: float = 1e-3
    init_sigma_vel: float = 0.05
    init_sigma_bg: float = 1e-2
    init_sigma_ba: float = 1e-1
    init_sigma_grav: float = 0.05

    @property
    def D(self) -> int:
        return self.K * SD + 2


class Window(NamedTuple):
    # current estimates
    q: jnp.ndarray       # [K,4]
    p: jnp.ndarray       # [K,3]
    v: jnp.ndarray       # [K,3]
    bg: jnp.ndarray      # [K,3]
    ba: jnp.ndarray      # [K,3]
    g_dir: jnp.ndarray   # [3] unit, direction of gravitational acceleration
    ts: jnp.ndarray      # [K] f64 timestamps (0 where inactive)
    active: jnp.ndarray  # [K] bool
    # Gaussian prior: E(x) = 0.5 d^T H d + b^T d, d = x [-] lin
    H_prior: jnp.ndarray  # [D,D]
    b_prior: jnp.ndarray  # [D]
    lin_q: jnp.ndarray
    lin_p: jnp.ndarray
    lin_v: jnp.ndarray
    lin_bg: jnp.ndarray
    lin_ba: jnp.ndarray
    lin_g: jnp.ndarray


def create(cfg: WindowConfig, dtype=jnp.float32) -> Window:
    K, D = cfg.K, cfg.D
    q0 = jnp.tile(lie.quat_identity(dtype), (K, 1))
    z3 = jnp.zeros((K, 3), dtype)
    g = jnp.asarray([0.0, 0.0, -1.0], dtype)
    return Window(
        q=q0, p=z3, v=z3, bg=z3, ba=z3, g_dir=g,
        ts=jnp.zeros(K, dtype), active=jnp.zeros(K, bool),
        H_prior=jnp.zeros((D, D), dtype), b_prior=jnp.zeros(D, dtype),
        lin_q=q0, lin_p=z3, lin_v=z3, lin_bg=z3, lin_ba=z3, lin_g=g,
    )


# ---------------------------------------------------------------------------
# tangent bookkeeping
# ---------------------------------------------------------------------------

def local_delta(w: Window, cfg: WindowConfig):
    """d = current [-] lin, the prior's evaluation point. [D]"""
    dr_dp = jax.vmap(lie.se3_local)(w.lin_q, w.lin_p, w.q, w.p)  # [K,6]
    dv = w.v - w.lin_v
    dbg = w.bg - w.lin_bg
    dba = w.ba - w.lin_ba
    per_state = jnp.concatenate([dr_dp, dv, dbg, dba], axis=-1)  # [K,15]
    dg = lie.s2_local(w.lin_g, w.g_dir)
    return jnp.concatenate([per_state.reshape(-1), dg])


def apply_update(w: Window, dx, cfg: WindowConfig) -> Window:
    """Retract tangent update onto all active states + gravity."""
    K = cfg.K
    dxs = dx[: K * SD].reshape(K, SD)
    dxs = jnp.where(w.active[:, None], dxs, 0.0)
    q2, p2 = jax.vmap(lie.se3_retract)(w.q, w.p, dxs[:, :6])
    return w._replace(
        q=q2, p=p2, v=w.v + dxs[:, 6:9],
        bg=w.bg + dxs[:, 9:12], ba=w.ba + dxs[:, 12:15],
        g_dir=lie.s2_retract(w.g_dir, dx[K * SD:]),
    )


def rebase_prior(w: Window, cfg: WindowConfig) -> Window:
    """Shift the prior's linearization point to the current estimates
    (first-order): b <- b + H d, lin <- current."""
    d = local_delta(w, cfg).astype(w.b_prior.dtype)
    return w._replace(
        b_prior=w.b_prior + w.H_prior @ d,
        lin_q=w.q, lin_p=w.p, lin_v=w.v, lin_bg=w.bg, lin_ba=w.ba,
        lin_g=w.g_dir,
    )


def init_priors(w: Window, cfg: WindowConfig) -> Window:
    """Anchor priors on slot 0 (X, V, B) and gravity
    (ref graph/manager.cpp:637-694)."""
    dtype = w.H_prior.dtype
    diag = jnp.concatenate([
        jnp.full(3, 1.0 / cfg.init_sigma_rot**2),
        jnp.full(3, 1.0 / cfg.init_sigma_pos**2),
        jnp.full(3, 1.0 / cfg.init_sigma_vel**2),
        jnp.full(3, 1.0 / cfg.init_sigma_bg**2),
        jnp.full(3, 1.0 / cfg.init_sigma_ba**2),
    ]).astype(dtype)
    H = w.H_prior.at[jnp.arange(SD), jnp.arange(SD)].add(diag)
    gi = cfg.K * SD
    H = H.at[jnp.arange(gi, gi + 2), jnp.arange(gi, gi + 2)].add(
        1.0 / cfg.init_sigma_grav**2)
    return w._replace(H_prior=H)


def pose_idx(slot):
    """Tangent indices of a state's pose block [dR(3), dp(3)]."""
    return slot * SD + jnp.arange(6)


def rot_vel_bg_idx(slot):
    """Tangent indices [dR(3), dv(3), dbg(3)] — the radar Doppler keys."""
    return slot * SD + jnp.concatenate(
        [jnp.arange(3), 6 + jnp.arange(3), 9 + jnp.arange(3)])


def between_pose_idx(slot_i, slot_j):
    """Tangent indices of two states' pose blocks (odometry between factor)."""
    return jnp.concatenate([pose_idx(slot_i), pose_idx(slot_j)])


def add_measurement_block(w: Window, idx, Hm, bm, cfg: WindowConfig) -> Window:
    """Absorb a finalized measurement quadratic (e.g. the scan's ICP factor)
    into the prior at the current linearization. Call after ``rebase_prior``.
    ``idx`` [m] are tangent indices (may be traced), Hm [m,m], bm [m]."""
    H = w.H_prior.at[idx[:, None], idx[None, :]].add(Hm.astype(w.H_prior.dtype))
    b = w.b_prior.at[idx].add(bm.astype(w.b_prior.dtype))
    return w._replace(H_prior=H, b_prior=b)


# ---------------------------------------------------------------------------
# IMU chain factors
# ---------------------------------------------------------------------------

def imu_block(pre_i, q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j, g_dir,
              g_mag):
    """Whitened Jacobian/residual of ONE gravity-augmented IMU factor
    (the TPU equivalent of the fork's ImuFactorWithGravity::linearize,
    SURVEY §2.4 item 2). Returns (J_w [9,26], r_w [9]); the 26 columns are
    [xi_i(9) | xi_j(9) | xi_bias_i(6) | xi_g(2)], whitened by the
    preintegration covariance. Shared by the window assembly and the
    sharded batch adjustment (parallel/window_shard.py) so both linearize
    identically."""
    f = pre.make_residual_fn(g_mag)
    dtype = p_i.dtype
    z9 = jnp.zeros(9, dtype)
    z6 = jnp.zeros(6, dtype)
    z2 = jnp.zeros(2, dtype)
    lin = (q_i, p_i, v_i, q_j, p_j, v_j, bg_i, ba_i, g_dir)
    r = f(z9, z9, z6, z2, pre_i, lin)
    Ji, Jj, Jb, Jg = jax.jacfwd(f, argnums=(0, 1, 2, 3))(
        z9, z9, z6, z2, pre_i, lin)
    J = jnp.concatenate([Ji, Jj, Jb, Jg], axis=-1)  # [9,26]
    # whiten with the preintegration covariance
    cov = pre_i.cov + jnp.eye(9, dtype=r.dtype) * 1e-10
    L = jnp.linalg.cholesky(cov)
    r_w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
    J_w = jax.scipy.linalg.solve_triangular(L, J, lower=True)
    return J_w, r_w


def _imu_factor_blocks(w: Window, preints: pre.PreintState, cfg: WindowConfig):
    """Linearize all K-1 consecutive IMU factors at current values.

    preints: PreintState stacked with leading dim K-1 (segment i -> i+1).
    Returns (J [K-1, 9, 26], r [K-1, 9]) — see ``imu_block``.
    """
    J, r = jax.vmap(imu_block, in_axes=(0,) * 9 + (None, None))(
        preints,
        w.q[:-1], w.p[:-1], w.v[:-1], w.bg[:-1], w.ba[:-1],
        w.q[1:], w.p[1:], w.v[1:], w.g_dir, cfg.g_mag,
    )
    return J, r


def imu_factor_cache(w: Window, preints: pre.PreintState, cfg: WindowConfig):
    """(J_w [K-1,9,26], L [K-1,9,9]) — whitened Jacobians + covariance
    Cholesky factors computed once per scan and reused across GN iterations
    via ``build_system(..., imu_cache=...)``."""
    J, _ = _imu_factor_blocks(w, preints, cfg)
    cov = preints.cov + jnp.eye(9, dtype=w.p.dtype) * 1e-10
    L = jnp.linalg.cholesky(cov)
    return J, L


def imu_residuals_whitened(w: Window, preints: pre.PreintState, L,
                           cfg: WindowConfig):
    """Whitened IMU residuals at current values using a fixed Cholesky
    factor ``L`` [K-1,9,9] — the residual-only refresh used when Jacobians
    are reused across GN iterations (they vary at second order within one
    scan's updates)."""
    f = pre.make_residual_fn(cfg.g_mag)
    z9 = jnp.zeros(9, w.p.dtype)
    z6 = jnp.zeros(6, w.p.dtype)
    z2 = jnp.zeros(2, w.p.dtype)

    def one(pre_i, L_i, q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j):
        lin = (q_i, p_i, v_i, q_j, p_j, v_j, bg_i, ba_i, w.g_dir)
        r = f(z9, z9, z6, z2, pre_i, lin)
        return jax.scipy.linalg.solve_triangular(L_i, r, lower=True)

    return jax.vmap(one)(preints, L, w.q[:-1], w.p[:-1], w.v[:-1],
                         w.bg[:-1], w.ba[:-1], w.q[1:], w.p[1:], w.v[1:])


def _bias_rw_blocks(w: Window, preints: pre.PreintState, cfg: WindowConfig):
    """Bias random-walk between factors, whitened: r = (b_j - b_i)/(sigma*sqrt(dt))."""
    dt = jnp.maximum(preints.dt, 1e-3)
    sg = cfg.sigma_bg_rw * jnp.sqrt(dt)
    sa = cfg.sigma_ba_rw * jnp.sqrt(dt)
    r_bg = (w.bg[1:] - w.bg[:-1]) / sg[:, None]
    r_ba = (w.ba[1:] - w.ba[:-1]) / sa[:, None]
    return r_bg, r_ba, sg, sa


def build_system(w: Window, preints: pre.PreintState, factor_valid,
                 cfg: WindowConfig, meas=(), imu_cache=None):
    """Assemble normal equations H dx = rhs over the full window tangent.

    factor_valid: [K-1] bool, IMU factor between slot i and i+1 active.
    meas: iterable of (idx [m], H [m,m], b [m]) live measurement blocks —
    tangent index vectors built with pose_idx / rot_vel_bg_idx /
    between_pose_idx (e.g. the current scan's freshly linearized ICP factor).
    """
    K, D = cfg.K, cfg.D
    dtype = w.p.dtype
    H = jnp.zeros((D, D), dtype)
    rhs = jnp.zeros(D, dtype)

    # prior
    d0 = local_delta(w, cfg).astype(dtype)
    H += w.H_prior
    rhs -= w.H_prior @ d0 + w.b_prior

    # IMU preintegration factors — one batched scatter-add over all K-1
    # factor blocks (duplicate indices, e.g. the shared gravity dims,
    # accumulate correctly). ``imu_cache=(J_w, L)`` reuses Jacobians across
    # GN iterations (second-order-stable) and refreshes residuals only.
    if imu_cache is not None:
        J, L = imu_cache
        r = imu_residuals_whitened(w, preints, L, cfg)
    else:
        J, r = _imu_factor_blocks(w, preints, cfg)
    fv = factor_valid.astype(dtype)
    Hf = jnp.einsum("kai,kaj,k->kij", J, J, fv)   # [K-1,26,26]
    bf = jnp.einsum("kai,ka,k->ki", J, r, fv)     # [K-1,26]
    gi = K * SD
    IDX = jnp.asarray([
        list(range(i * SD, i * SD + 9))
        + list(range((i + 1) * SD, (i + 1) * SD + 9))
        + list(range(i * SD + 9, i * SD + 15))
        + list(range(gi, gi + 2))
        for i in range(K - 1)
    ], jnp.int32)                                  # [K-1,26] static
    H = H.at[IDX[:, :, None], IDX[:, None, :]].add(Hf)
    rhs = rhs.at[IDX].add(-bf)

    # bias random walk between factors, batched: block [[W,-W],[-W,W]] on
    # the 12 bias dims of each consecutive pair
    r_bg, r_ba, sg, sa = _bias_rw_blocks(w, preints, cfg)
    wg = fv / (sg ** 2)                            # [K-1]
    wa = fv / (sa ** 2)
    Wd = jnp.concatenate([jnp.tile(wg[:, None], (1, 3)),
                          jnp.tile(wa[:, None], (1, 3))], axis=1)  # [K-1,6]
    Wm = jax.vmap(jnp.diag)(Wd)                    # [K-1,6,6]
    Hb = jnp.concatenate([
        jnp.concatenate([Wm, -Wm], axis=2),
        jnp.concatenate([-Wm, Wm], axis=2),
    ], axis=1)                                     # [K-1,12,12]
    rr = jnp.concatenate([r_bg * sg[:, None], r_ba * sa[:, None]],
                         axis=1)                   # [K-1,6] unwhitened
    bb = jnp.concatenate([Wd * rr, -(Wd * rr)], axis=1)   # [K-1,12]
    BIDX = jnp.asarray([
        list(range(i * SD + 9, i * SD + 15))
        + list(range((i + 1) * SD + 9, (i + 1) * SD + 15))
        for i in range(K - 1)
    ], jnp.int32)                                  # [K-1,12]
    H = H.at[BIDX[:, :, None], BIDX[:, None, :]].add(Hb)
    rhs = rhs.at[BIDX].add(bb)

    # live measurement blocks (ICP etc.): H dx = -b convention
    for idx, Hm, bm in meas:
        H = H.at[idx[:, None], idx[None, :]].add(Hm.astype(dtype))
        rhs = rhs.at[idx].add(-bm.astype(dtype))

    # inactive dims: identity rows, zero rhs
    act = jnp.repeat(w.active, SD)
    act = jnp.concatenate([act, jnp.ones(2, bool)])
    H = jnp.where(act[:, None] & act[None, :], H, 0.0)
    H = H.at[jnp.arange(D), jnp.arange(D)].add(jnp.where(act, cfg.damping, 1.0))
    rhs = jnp.where(act, rhs, 0.0)
    return H, rhs


def solve(H, rhs):
    """Solve the (small, dense, SPD-damped) system via Jacobi-equilibrated
    Cholesky.

    The window mixes information scales of ~1e7 (tight initial rotation
    priors, accumulated scan factors) with ~1e-1 (fresh velocity states), so
    the raw condition number can exceed what an f32 Cholesky tolerates
    (observed 8e9 on a tracking-loss replay -> NaN pivots). Symmetric
    diagonal scaling D^-1/2 H D^-1/2 removes the scale disparity. If the
    factorization still fails (truly singular system), the update degrades
    to zero — hold the IMU-predicted state, the same graceful degradation
    the reference shows when ICP degenerates — instead of poisoning the
    window with NaNs."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
    L = jnp.linalg.cholesky(H / d[:, None] / d[None, :])
    y = jax.scipy.linalg.solve_triangular(L, rhs / d, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False) / d
    return jnp.where(jnp.isfinite(dx), dx, 0.0)


# ---------------------------------------------------------------------------
# sliding: append + marginalize
# ---------------------------------------------------------------------------

def append_state(w: Window, q, p, v, bg, ba, ts) -> Window:
    """Place a new state in the first inactive slot (sequencer guarantees one
    exists by marginalizing first). Uses a one-hot mask so shapes stay static."""
    slot = jnp.argmin(w.active.astype(jnp.int32))  # first False
    onehot = jnp.arange(w.active.shape[0]) == slot
    sel = onehot[:, None]
    return w._replace(
        q=jnp.where(sel, q, w.q), p=jnp.where(sel, p, w.p),
        v=jnp.where(sel, v, w.v), bg=jnp.where(sel, bg, w.bg),
        ba=jnp.where(sel, ba, w.ba),
        ts=jnp.where(onehot, ts, w.ts),
        active=w.active | onehot,
        # linearization mirrors current for the fresh slot (zero delta)
        lin_q=jnp.where(sel, q, w.lin_q), lin_p=jnp.where(sel, p, w.lin_p),
        lin_v=jnp.where(sel, v, w.lin_v), lin_bg=jnp.where(sel, bg, w.lin_bg),
        lin_ba=jnp.where(sel, ba, w.lin_ba),
    )


def marginalize_oldest(w: Window, preints: pre.PreintState,
                       cfg: WindowConfig) -> Window:
    """Schur-complement slot 0 out of (prior + IMU factor 0->1), then shift
    every slot left by one. Replaces fixed-lag factor removal
    (ref graph/manager.cpp:399-407 key-timestamp pruning).

    ``preints`` is the full stacked [K-1] chain; only segment 0 is consumed.
    """
    K, D = cfg.K, cfg.D
    dtype = w.p.dtype
    w = rebase_prior(w, cfg)

    # prior + the one IMU factor touching slot 0, at current values (d0 = 0)
    H = w.H_prior
    b = w.b_prior
    Jf, rf = _imu_factor_blocks(w, preints, cfg)
    J0, r0 = Jf[0], rf[0]
    gi = K * SD
    idx0 = jnp.concatenate([
        jnp.arange(0, 9), jnp.arange(SD, SD + 9),
        jnp.arange(9, 15), jnp.arange(gi, gi + 2),
    ])
    H = H.at[idx0[:, None], idx0[None, :]].add(
        (J0.T @ J0).astype(dtype))
    b = b.at[idx0].add((J0.T @ r0).astype(dtype))
    # bias RW 0->1
    r_bg, r_ba, sg, sa = _bias_rw_blocks(w, preints, cfg)
    for off, sgm, rr in ((9, sg[0], r_bg[0] * sg[0]), (12, sa[0], r_ba[0] * sa[0])):
        wgt = 1.0 / sgm**2
        ii = jnp.arange(off, off + 3)
        jj = jnp.arange(SD + off, SD + off + 3)
        H = H.at[ii[:, None], ii[None, :]].add(jnp.eye(3, dtype=dtype) * wgt)
        H = H.at[jj[:, None], jj[None, :]].add(jnp.eye(3, dtype=dtype) * wgt)
        H = H.at[ii[:, None], jj[None, :]].add(-jnp.eye(3, dtype=dtype) * wgt)
        H = H.at[jj[:, None], ii[None, :]].add(-jnp.eye(3, dtype=dtype) * wgt)
        b = b.at[ii].add(wgt * rr)
        b = b.at[jj].add(-wgt * rr)

    # Schur complement out dims [0, 15), computed in the EQUILIBRATED basis
    # end-to-end. The system mixes information scales 1e6..1e-1; in raw
    # scale the f32 rounding of the large blocks lands in the small blocks
    # (bias, gravity) as an O(1) RELATIVE error — measured: a loose accel
    # bias prior (initial_bias_acc_sigma 1.0, the reference's own ENWIDE
    # value) collected ~0.5-absolute errors from the ~5e6-scale pose rows,
    # flipped the marginal prior indefinite (min eig -0.3) and ran the
    # bias estimate to 6.7 m/s^2 by scan 16 of a corridor replay. Scaling
    # H by D^-1/2 on BOTH sides first makes every entry O(1), so f32
    # rounding stays relative per-entry; unscaling restores the blocks with
    # their own scale. (f64 reproduces the same replay at ATE 0.44 m; this
    # f32 path must match it.)
    dall = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
    Hs = H / dall[:, None] / dall[None, :]
    bs = b / dall
    Hkk = Hs[:SD, :SD] + jnp.eye(SD, dtype=dtype) * 1e-7
    Hkr = Hs[:SD, SD:]
    Hrr = Hs[SD:, SD:]
    bk = bs[:SD]
    br = bs[SD:]
    rhs_all = jnp.concatenate([Hkr, bk[:, None]], axis=1)
    sol = jnp.linalg.solve(Hkk, rhs_all)
    # one step of iterative refinement: squares the effective residual of
    # the f32 solve when correlations leave Hkk ill-conditioned even after
    # equilibration (costs one extra [SD,SD] solve per scan)
    sol = sol + jnp.linalg.solve(Hkk, rhs_all - Hkk @ sol)
    dr = dall[SD:]
    Hred = (Hrr - Hkr.T @ sol[:, :-1]) * dr[:, None] * dr[None, :]
    bred = (br - Hkr.T @ sol[:, -1]) * dr

    # embed reduced system back: old slots 1..K-1 -> new 0..K-2, g stays
    Hp = jnp.zeros((D, D), dtype)
    bp = jnp.zeros(D, dtype)
    npos = jnp.concatenate([jnp.arange(0, (K - 1) * SD),
                            jnp.arange(K * SD, D)])
    Hp = Hp.at[npos[:, None], npos[None, :]].set(Hred)
    bp = bp.at[npos].set(bred)

    def shift(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    return w._replace(
        q=shift(w.q), p=shift(w.p), v=shift(w.v), bg=shift(w.bg),
        ba=shift(w.ba), ts=shift(w.ts).at[-1].set(0.0),
        active=shift(w.active).at[-1].set(False),
        H_prior=Hp, b_prior=bp,
        lin_q=shift(w.lin_q), lin_p=shift(w.lin_p), lin_v=shift(w.lin_v),
        lin_bg=shift(w.lin_bg), lin_ba=shift(w.lin_ba),
    )


def insert_state_at(w: Window, pos, q, p, v, bg, ba, ts,
                    cfg: WindowConfig) -> Window:
    """Insert a state at slot ``pos`` (traced int), shifting slots >= pos
    right by one. Requires a free slot (active count < K) — the sequencer
    marginalizes first when full.

    This is the TPU-native replacement for the reference's out-of-order
    factor surgery (graph/manager.cpp:267-417): instead of breaking an IMU
    factor inside iSAM2, the window inserts the state and the sequencer
    re-integrates the two surrounding preintegration segments. The prior is
    block-permuted accordingly (the inserted state carries no prior).
    """
    K, D = cfg.K, cfg.D
    src = jnp.arange(K)
    take = jnp.where(src < pos, src, src - 1)   # right shift from pos
    at_pos = src == pos

    def shift_in(arr, new_val):
        shifted = arr[take]
        sel = at_pos.reshape((K,) + (1,) * (arr.ndim - 1))
        return jnp.where(sel, new_val, shifted)

    # prior permutation: old block b goes to b if b < pos else b+1;
    # the inserted block's rows/cols are zero.
    tang_new = jnp.arange(D)
    blk_new = jnp.minimum(tang_new // SD, K - 1)
    off = tang_new - blk_new * SD
    is_g = tang_new >= K * SD
    src_blk = jnp.where(blk_new < pos, blk_new, blk_new - 1)
    src_idx = jnp.where(is_g, tang_new, src_blk * SD + off)
    fresh = (~is_g) & (blk_new == pos)
    Hp = w.H_prior[src_idx[:, None], src_idx[None, :]]
    Hp = jnp.where(fresh[:, None] | fresh[None, :], 0.0, Hp)
    bp = jnp.where(fresh, 0.0, w.b_prior[src_idx])

    return w._replace(
        q=shift_in(w.q, q), p=shift_in(w.p, p), v=shift_in(w.v, v),
        bg=shift_in(w.bg, bg), ba=shift_in(w.ba, ba),
        ts=shift_in(w.ts, ts),
        active=shift_in(w.active, jnp.asarray(True)),
        H_prior=Hp, b_prior=bp,
        lin_q=shift_in(w.lin_q, q), lin_p=shift_in(w.lin_p, p),
        lin_v=shift_in(w.lin_v, v), lin_bg=shift_in(w.lin_bg, bg),
        lin_ba=shift_in(w.lin_ba, ba),
    )


def newest_slot(w: Window):
    """Index of the newest active slot."""
    return jnp.sum(w.active.astype(jnp.int32)) - 1
