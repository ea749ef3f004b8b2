"""Window/keyframe sharding: distributed Schur-complement batch adjustment.

The sequence-parallel / long-context axis of this domain (SURVEY.md §2.5,
BASELINE.md targets): a long window of K states — the live sliding window
is tiny, but the *batch* problems (full-trajectory smoothing after a run,
long-lag refinement, map deformation) grow with trajectory length — is
sharded over a ``wp`` mesh axis in contiguous chunks of Kc = K/n_wp
states.

The normal equations of (IMU chain + bias random walks + per-state
measurement quadratics + anchor priors) are block-tridiagonal in the
states with a dense 2-column gravity border — exactly the structure of
the reference's full factor graph before iSAM2 reorders it
(ref src/graph/manager.cpp:466-475 runs the same math incrementally on
one CPU). Domain decomposition solves it exactly, not iteratively:

1. each shard linearizes and assembles ONLY its chunk's factor blocks
   (the expensive jacfwd work — this is where the speedup lives),
2. eliminates its chunk-interior states by an equilibrated local Schur
   complement onto its borders (left interface state, right interface
   state, gravity) — 32x32 per shard,
3. ``psum`` assembles the global interface system
   (n_wp*15 + 2 dims, tiny) which every shard solves replicated,
4. back-substitutes its interior states locally.

One collective round (a psum of a ~[128,128] matrix) per Gauss-Newton
iteration, riding ICI; no NCCL/MPI. The per-factor linearization is
``graph.window.imu_block`` — the same function the live window uses, so
the sharded solve is numerically the same system as
``graph.window.build_system`` (test_parallel gates the equivalence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mimosa_tpu.core import lie
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre

SD = win.SD

# factor 26-column layout [xi_i(9) | xi_j(9) | bias_i(6) | g(2)] -> the
# 32-dim (state_i(15), state_j(15), g(2)) pair-local layout
_M26 = np.concatenate([np.arange(0, 9), 15 + np.arange(0, 9),
                       np.arange(9, 15), np.asarray([30, 31])]).astype(np.int32)
# bias dims of (state_i, state_j) in the 32-dim layout
_BI = np.concatenate([np.arange(9, 15), np.arange(24, 30)]).astype(np.int32)


def make_wp_mesh(n_devices=None):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("wp",))


def _factor32(pre_i, fv, q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j,
              bg_j, ba_j, g_dir, cfg):
    """One IMU+bias-RW factor as a 32x32 quadratic on (state_i, state_j, g).

    Mirrors graph.window.build_system's per-factor assembly exactly
    (same whitening, same bias-RW weights, same signs); returns
    (A [32,32], rhs [32]) with the H dx = rhs convention."""
    J, r = win.imu_block(pre_i, q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j,
                         g_dir, cfg.g_mag)
    dtype = p_i.dtype
    f = fv.astype(dtype)
    A = jnp.zeros((32, 32), dtype)
    rhs = jnp.zeros(32, dtype)
    A = A.at[_M26[:, None], _M26[None, :]].add((J.T @ J) * f)
    rhs = rhs.at[_M26].add(-(J.T @ r) * f)

    # bias random walk between factor (ref imu/manager.cpp:407-426):
    # weights and signs mirror window._bias_rw_blocks/build_system
    dt = jnp.maximum(pre_i.dt, 1e-3)
    wg = f / (cfg.sigma_bg_rw ** 2 * dt)
    wa = f / (cfg.sigma_ba_rw ** 2 * dt)
    Wd = jnp.concatenate([jnp.full(3, wg, dtype), jnp.full(3, wa, dtype)])
    rr = jnp.concatenate([bg_j - bg_i, ba_j - ba_i]).astype(dtype)
    Wm = jnp.diag(Wd)
    Hb = jnp.block([[Wm, -Wm], [-Wm, Wm]])
    A = A.at[_BI[:, None], _BI[None, :]].add(Hb)
    rhs = rhs.at[_BI].add(jnp.concatenate([Wd * rr, -(Wd * rr)]))
    return A, rhs


def _equilibrated_solve_cols(T, Y):
    """x = T^-1 Y for SPD-damped T via Jacobi equilibration + one step of
    iterative refinement (the window.solve / marginalize_oldest recipe)."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(T), 1e-12))
    Ts = T / d[:, None] / d[None, :]
    Ys = Y / d[:, None]
    sol = jnp.linalg.solve(Ts, Ys)
    sol = sol + jnp.linalg.solve(Ts, Ys - Ts @ sol)
    return sol / d[:, None]


def _shard_body(q, p, v, bg, ba, g_dir, prior, pre_c, fv_c, measH_c,
                measb_c, *, cfg, n_wp, Kc, K):
    """Per-shard: assemble chunk blocks, Schur-eliminate interiors,
    psum + solve the interface system, back-substitute."""
    c = jax.lax.axis_index("wp")
    dtype = p.dtype
    H0, r0, Hg, rg = prior

    # factor slot j of this shard = global factor c*Kc + j - 1
    gi = c * Kc + jnp.arange(Kc) - 1
    valid = (gi >= 0) & fv_c
    si = jnp.clip(gi, 0, K - 2)
    sj = si + 1
    def f32(pre_i, fv, q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j, bg_j,
            ba_j):
        return _factor32(pre_i, fv, q_i, p_i, v_i, bg_i, ba_i,
                         q_j, p_j, v_j, bg_j, ba_j, g_dir, cfg)

    A_all, rhs_all = jax.vmap(f32)(
        pre_c, valid,
        q[si], p[si], v[si], bg[si], ba[si],
        q[sj], p[sj], v[sj], bg[sj], ba[sj])

    # local extended layout: ext state 0 = left interface (last state of
    # chunk c-1), ext 1..Kc = owned states (ext Kc = right interface), + g
    M = (Kc + 1) * SD + 2
    goff = (Kc + 1) * SD
    pair30 = jnp.arange(Kc)[:, None] * SD + jnp.arange(2 * SD)[None, :]
    EIDX = jnp.concatenate([
        pair30, jnp.tile(jnp.asarray([[goff, goff + 1]]), (Kc, 1)),
    ], axis=1)                                                 # [Kc,32]
    Hloc = jnp.zeros((M, M), dtype)
    rloc = jnp.zeros(M, dtype)
    Hloc = Hloc.at[EIDX[:, :, None], EIDX[:, None, :]].add(A_all)
    rloc = rloc.at[EIDX].add(rhs_all)

    # per-state measurement quadratics + damping on owned states
    SIDX = (1 + jnp.arange(Kc))[:, None] * SD + jnp.arange(SD)[None, :]
    Hloc = Hloc.at[SIDX[:, :, None], SIDX[:, None, :]].add(
        measH_c.astype(dtype))
    rloc = rloc.at[SIDX].add(-measb_c.astype(dtype))
    diag_own = jnp.zeros(M, dtype).at[SIDX.reshape(-1)].set(cfg.damping)
    # gravity damping + priors added exactly once (by shard 0)
    is0 = (c == 0).astype(dtype)
    diag_own = diag_own.at[goff:].set(is0 * cfg.damping)
    Hloc = Hloc.at[jnp.arange(M), jnp.arange(M)].add(diag_own)
    s0 = SD + jnp.arange(SD)                  # ext 1 = global state 0
    Hloc = Hloc.at[s0[:, None], s0[None, :]].add(is0 * H0)
    rloc = rloc.at[s0].add(-is0 * (H0 @ r0))
    Hloc = Hloc.at[goff:, goff:].add(is0 * Hg)
    rloc = rloc.at[goff:].add(-is0 * (Hg @ rg))

    # local Schur complement of the interiors (ext 1..Kc-1) onto the
    # border [L(15), R(15), g(2)]
    bidx = jnp.concatenate([jnp.arange(SD), Kc * SD + jnp.arange(SD),
                            jnp.asarray([goff, goff + 1])])
    T = Hloc[SD:Kc * SD, SD:Kc * SD]
    Ub = Hloc[SD:Kc * SD, :][:, bidx]                          # [ni,32]
    Abb = Hloc[bidx[:, None], bidx[None, :]]
    ri = rloc[SD:Kc * SD]
    rb = rloc[bidx]
    sol = _equilibrated_solve_cols(T, jnp.concatenate(
        [Ub, ri[:, None]], axis=1))                            # [ni,33]
    S = Abb - Ub.T @ sol[:, :-1]
    srb = rb - Ub.T @ sol[:, -1]

    # global interface system [iface_0..iface_{n_wp-1}, g]; shard 0 has no
    # left interface — its S rows/cols for L are exactly zero (no factor,
    # no damping touches L there), so the clipped scatter adds zeros
    B = n_wp * SD + 2
    idxb = jnp.concatenate([(c - 1) * SD + jnp.arange(SD),
                            c * SD + jnp.arange(SD),
                            jnp.asarray([n_wp * SD, n_wp * SD + 1])])
    idxb = jnp.clip(idxb, 0, B - 1)
    Gm = jnp.zeros((B, B), dtype).at[idxb[:, None], idxb[None, :]].add(S)
    gvec = jnp.zeros(B, dtype).at[idxb].add(srb)
    Gm = jax.lax.psum(Gm, "wp")
    gvec = jax.lax.psum(gvec, "wp")
    xb = win.solve(Gm, gvec)                  # replicated, equilibrated

    # back-substitute interiors; owned dx = interiors + right interface
    xb_loc = xb[idxb]                          # L part zero-coupled on c=0
    x_int = sol[:, -1] - sol[:, :-1] @ xb_loc
    dx_own = jnp.concatenate([
        x_int.reshape(Kc - 1, SD),
        jax.lax.dynamic_slice(xb, (c * SD,), (SD,))[None, :],
    ], axis=0)                                 # [Kc,SD]
    return dx_own, xb[-2:]


def _chunk_factors(preints, factor_valid, K):
    """Pad the [K-1] factor chain to [K] with a leading dummy so slot j of
    chunk c is global factor c*Kc + j - 1 (shard 0's slot 0 is invalid)."""
    padded = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a[:1], a], axis=0), preints)
    fv = jnp.concatenate([jnp.zeros(1, bool), factor_valid])
    return padded, fv


def distributed_gn_step(mesh: Mesh, q, p, v, bg, ba, g_dir,
                        preints: pre.PreintState, factor_valid,
                        meas_H, meas_b, cfg: win.WindowConfig, prior):
    """One exact Gauss-Newton step of the K-state batch window, states
    sharded over mesh axis 'wp'.

    q [K,4] .. ba [K,3], g_dir [3] replicated; preints/factor_valid [K-1]
    the IMU chain; meas_H [K,15,15] / meas_b [K,15] per-state measurement
    quadratics (H dx = rhs convention, rhs -= b);
    prior = (H0 [15,15], r0 [15], Hg [2,2], rg [2]) anchor prior on state 0
    and gravity with residuals at the current estimate.
    Returns (dx [K,15], dg [2]) — the same solution as
    window.build_system + window.solve on the equivalent dense system.
    """
    K = q.shape[0]
    n_wp = mesh.shape["wp"]
    if K % n_wp or K // n_wp < 2:
        raise ValueError(f"K={K} must be a multiple of n_wp={n_wp} with "
                         f">=2 states per shard")
    Kc = K // n_wp
    pre_f, fv_f = _chunk_factors(preints, factor_valid, K)
    body = functools.partial(_shard_body, cfg=cfg, n_wp=n_wp, Kc=Kc, K=K)
    rep = P()
    shd = P("wp")
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, rep, shd, shd, shd, shd),
        out_specs=(shd, rep),
    )(q, p, v, bg, ba, g_dir, prior, pre_f, fv_f, meas_H, meas_b)


def anchor_prior(q, p, v, bg, ba, g_dir, anchor, cfg: win.WindowConfig):
    """(H0, r0, Hg, rg) pulling state 0 / gravity to ``anchor`` =
    (q0,p0,v0,bg0,ba0,g0) with the WindowConfig init sigmas
    (ref graph/manager.cpp:637-694)."""
    dtype = p.dtype
    diag = jnp.concatenate([
        jnp.full(3, 1.0 / cfg.init_sigma_rot ** 2),
        jnp.full(3, 1.0 / cfg.init_sigma_pos ** 2),
        jnp.full(3, 1.0 / cfg.init_sigma_vel ** 2),
        jnp.full(3, 1.0 / cfg.init_sigma_bg ** 2),
        jnp.full(3, 1.0 / cfg.init_sigma_ba ** 2),
    ]).astype(dtype)
    q0, p0, v0, bg0, ba0, g0 = anchor
    r0 = jnp.concatenate([
        lie.se3_local(q0, p0, q[0], p[0]),
        v[0] - v0, bg[0] - bg0, ba[0] - ba0,
    ]).astype(dtype)
    Hg = (jnp.eye(2, dtype=dtype) / cfg.init_sigma_grav ** 2)
    rg = lie.s2_local(g0, g_dir).astype(dtype)
    return jnp.diag(diag), r0, Hg, rg


def batch_adjust(mesh: Mesh, q, p, v, bg, ba, g_dir, preints, factor_valid,
                 meas_fn, cfg: win.WindowConfig, iters=3):
    """Distributed batch trajectory adjustment: ``iters`` GN rounds, each
    re-linearizing measurements via ``meas_fn(q,p,v,bg,ba,g_dir) ->
    (meas_H [K,15,15], meas_b [K,15])`` and re-anchoring the prior at the
    INITIAL state-0/gravity estimate (batch smoothing keeps the gauge).

    The whole iteration (meas_fn, prior, sharded solve, retraction) is ONE
    jitted program: on the tunneled TPU an eager dispatch both costs
    ~25 ms per op and permanently downgrades the relay session to
    per-program round-trips (CLAUDE.md), so the loop must never go
    op-by-op."""
    anchor = (q[0], p[0], v[0], bg[0], ba[0], g_dir)

    @jax.jit
    def one_iter(q, p, v, bg, ba, g_dir):
        meas_H, meas_b = meas_fn(q, p, v, bg, ba, g_dir)
        prior = anchor_prior(q, p, v, bg, ba, g_dir, anchor, cfg)
        dx, dg = distributed_gn_step(mesh, q, p, v, bg, ba, g_dir,
                                     preints, factor_valid,
                                     meas_H, meas_b, cfg, prior)
        q2, p2 = jax.vmap(lie.se3_retract)(q, p, dx[:, :6])
        return (q2, p2, v + dx[:, 6:9], bg + dx[:, 9:12],
                ba + dx[:, 12:15], lie.s2_retract(g_dir, dg))

    for _ in range(iters):
        q, p, v, bg, ba, g_dir = one_iter(q, p, v, bg, ba, g_dir)
    return q, p, v, bg, ba, g_dir
