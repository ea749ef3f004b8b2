"""Distributed (wp-sharded) batch window adjustment vs the dense oracle.

The sharded domain-decomposition solve (parallel/window_shard.py) must
produce the SAME Gauss-Newton step as assembling the full dense system
with graph.window.build_system and solving it on one device — the two
paths share the per-factor linearization (window.imu_block), so any gap
is in the Schur algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie
from mimosa_tpu.graph import window as win
from mimosa_tpu.imu import preintegration as pre
from mimosa_tpu.parallel import window_shard as ws

from test_window import simulate, stack_preints

K = 16


def build_batch(dtype, T=2.0, imu_rate=200, state_rate=10, seed=0,
                state_noise=0.0):
    """K states along the simulated trajectory + the preint chain."""
    states, segs, dt = simulate(T=T, imu_rate=imu_rate,
                                state_rate=state_rate, seed=seed)
    assert len(segs) >= K - 1
    rng = np.random.default_rng(seed + 1)
    arr = lambda x: jnp.asarray(np.asarray(x), dtype)  # noqa: E731
    qs, ps, vs = [], [], []
    for k in range(K):
        q_gt, p_gt, v_gt = states[k]
        if state_noise and k > 0:
            q_gt = np.asarray(
                lie.quat_mul(jnp.asarray(q_gt),
                             lie.exp_so3(jnp.asarray(
                                 rng.normal(size=3) * state_noise))))
            p_gt = p_gt + rng.normal(size=3) * state_noise
            v_gt = v_gt + rng.normal(size=3) * state_noise
        qs.append(q_gt), ps.append(p_gt), vs.append(v_gt)
    q, p, v = arr(qs), arr(ps), arr(vs)
    bg = jnp.zeros((K, 3), dtype)
    ba = jnp.zeros((K, 3), dtype)
    g_dir = jnp.asarray([0.0, 0.0, -1.0], dtype)
    chain = []
    for accs, gyrs in segs[: K - 1]:
        chain.append(pre.preintegrate(
            arr(accs), arr(gyrs), jnp.full(len(accs), dt, dtype),
            jnp.zeros(3, dtype), jnp.zeros(3, dtype), 1e-4, 1e-5))
    preints = stack_preints(chain)
    return (q, p, v, bg, ba, g_dir), preints, states


def dense_gn_step(q, p, v, bg, ba, g_dir, preints, fv, meas_H, meas_b,
                  cfg):
    """Oracle: the same system through window.build_system + win.solve."""
    dtype = p.dtype
    w = win.create(cfg, dtype)
    w = w._replace(q=q, p=p, v=v, bg=bg, ba=ba, g_dir=g_dir,
                   active=jnp.ones(K, bool),
                   lin_q=q, lin_p=p, lin_v=v, lin_bg=bg, lin_ba=ba,
                   lin_g=g_dir)
    w = win.init_priors(w, cfg)
    meas = [(k * win.SD + jnp.arange(win.SD), meas_H[k], meas_b[k])
            for k in range(K)]
    H, rhs = win.build_system(w, preints, fv, cfg, meas=meas)
    dx = win.solve(H, rhs)
    return dx[: K * win.SD].reshape(K, win.SD), dx[K * win.SD:]


def rand_meas(dtype, seed=3, scale=50.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(K, win.SD, win.SD))
    meas_H = jnp.asarray(
        np.einsum("kij,kil->kjl", A, A) / win.SD * scale
        + np.eye(win.SD) * 1e-3, dtype)
    meas_b = jnp.asarray(rng.normal(size=(K, win.SD)) * scale, dtype)
    return meas_H, meas_b


@pytest.mark.heavy
def test_distributed_step_matches_dense_f64():
    cfg = win.WindowConfig(K=K, damping=1e-6)
    (q, p, v, bg, ba, g_dir), preints, _ = build_batch(jnp.float64)
    meas_H, meas_b = rand_meas(jnp.float64)
    fv = jnp.ones(K - 1, bool).at[5].set(False)  # a dead segment too
    dxd, dgd = dense_gn_step(q, p, v, bg, ba, g_dir, preints, fv,
                             meas_H, meas_b, cfg)
    mesh = ws.make_wp_mesh(8)
    prior = ws.anchor_prior(q, p, v, bg, ba, g_dir,
                            (q[0], p[0], v[0], bg[0], ba[0], g_dir), cfg)
    dxs, dgs = ws.distributed_gn_step(mesh, q, p, v, bg, ba, g_dir,
                                      preints, fv, meas_H, meas_b, cfg,
                                      prior)
    scale = max(float(jnp.max(jnp.abs(dxd))), 1e-9)
    np.testing.assert_allclose(np.asarray(dxs), np.asarray(dxd),
                               atol=1e-8 * scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dgs), np.asarray(dgd),
                               atol=1e-8, rtol=1e-6)


@pytest.mark.heavy
def test_distributed_step_f32_close():
    """Production dtype: the sharded f32 step must stay within f32
    round-off of the f64 truth (both equilibrated)."""
    cfg = win.WindowConfig(K=K, damping=1e-6)
    (q, p, v, bg, ba, g_dir), preints, _ = build_batch(jnp.float64)
    meas_H, meas_b = rand_meas(jnp.float64)
    fv = jnp.ones(K - 1, bool)
    dxd, _ = dense_gn_step(q, p, v, bg, ba, g_dir, preints, fv,
                           meas_H, meas_b, cfg)
    mesh = ws.make_wp_mesh(8)
    to32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.float32)
        if a.dtype == jnp.float64 else a, t)
    q3, p3, v3, bg3, ba3, g3, pre3, mH3, mb3 = to32(
        (q, p, v, bg, ba, g_dir, preints, meas_H, meas_b))
    prior = ws.anchor_prior(q3, p3, v3, bg3, ba3, g3,
                            (q3[0], p3[0], v3[0], bg3[0], ba3[0], g3), cfg)
    dxs, _ = ws.distributed_gn_step(mesh, q3, p3, v3, bg3, ba3, g3,
                                    pre3, fv, mH3, mb3, cfg, prior)
    assert np.isfinite(np.asarray(dxs)).all()
    # the honest f32 gate: sharding must not degrade numerics beyond what
    # the DENSE f32 solve already loses on this system (cond ~1e9 from
    # tight preintegration info vs soft measurement blocks)
    dx32, _ = dense_gn_step(q3, p3, v3, bg3, ba3, g3, pre3, fv,
                            mH3, mb3, cfg)
    denom = max(float(jnp.linalg.norm(dxd)), 1e-9)
    err_dense32 = float(jnp.linalg.norm(
        np.asarray(dx32, np.float64) - np.asarray(dxd))) / denom
    err_shard32 = float(jnp.linalg.norm(
        np.asarray(dxs, np.float64) - np.asarray(dxd))) / denom
    assert err_shard32 < max(3.0 * err_dense32, 1e-4), \
        (err_shard32, err_dense32)


def test_batch_adjust_recovers_trajectory():
    """Functional: noisy initial states + pose measurements of every 4th
    state -> the distributed batch adjustment pulls the trajectory back
    to ground truth (IMU chain interpolates between anchors)."""
    dtype = jnp.float64
    cfg = win.WindowConfig(K=K, damping=1e-9)
    (q0, p0, v0, bg0, ba0, g_dir), preints, states = build_batch(
        dtype, state_noise=0.05, seed=2)
    q_gt = jnp.asarray([states[k][0] for k in range(K)], dtype)
    p_gt = jnp.asarray([states[k][1] for k in range(K)], dtype)
    anchored = np.zeros(K, bool)
    anchored[::4] = True
    anc = jnp.asarray(anchored)
    wgt = 1e4

    def meas_fn(q, p, v, bg, ba, g):
        def one(qk, pk, qm, pm, on):
            r = lie.se3_local(qm, pm, qk, pk)
            H = jnp.zeros((win.SD, win.SD), dtype).at[
                jnp.arange(6)[:, None], jnp.arange(6)[None, :]].add(
                jnp.eye(6, dtype=dtype) * wgt * on)
            b = jnp.zeros(win.SD, dtype).at[:6].set(wgt * on * r)
            return H, b
        return jax.vmap(one)(q, p, q_gt, p_gt, anc.astype(dtype))

    mesh = ws.make_wp_mesh(8)
    fv = jnp.ones(K - 1, bool)
    err0 = float(jnp.linalg.norm(p0 - p_gt, axis=-1).max())
    q, p, v, bg, ba, g = ws.batch_adjust(
        mesh, q0, p0, v0, bg0, ba0, g_dir, preints, fv, meas_fn, cfg,
        iters=4)
    err1 = float(jnp.linalg.norm(p - p_gt, axis=-1).max())
    assert err1 < 0.1 * err0, (err0, err1)
    # anchored states land on the measurements; in-between states are
    # interpolated by the IMU factors and must also improve
    mid = ~anchored
    em = float(jnp.linalg.norm((p - p_gt)[jnp.asarray(mid)], axis=-1).max())
    assert em < 0.05, em
