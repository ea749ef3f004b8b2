"""Global batch smoothing of a finished replay (the offline pass 3).

The live estimator is a fixed-lag filter: information older than the
window is marginalized, so early poses never benefit from later
observations. This module rebuilds the FULL trajectory as one batch
problem and solves it with the wp-sharded distributed Gauss-Newton
(parallel/window_shard.py):

* states     = the trajectory rows (q, p from the device ring; velocities
  initialized by finite differences; biases re-estimated from zero),
* measurements = each scan's absorbed pose quadratic — the [6,6]
  information matrix of its ICP(+photometric) registration, which the
  sequencer logs per scan into the debug ring (sequencer.DBG_W layout) —
  replayed as unary pose factors anchored at the replay's converged poses,
* IMU chain  = re-preintegrated between consecutive rows from the raw IMU
  stream (gravity-augmented factors, the same window.imu_block math).

The reference has no batch backend at all (its iSAM2 smoother is strictly
fixed-lag, ref graph/manager.cpp:45-93); this is the TPU-native
full-smoothing capability BASELINE.md's window-sharding target describes.
"""

from __future__ import annotations

import numpy as np


def smooth(sequencer, imu_ts, imu_acc, imu_gyro, mesh=None, iters=3,
           max_imu_per_segment=256, max_states=4096,
           weak_sigma_rot=0.2, weak_sigma_pos=0.5):
    """Batch-smooth a finished replay. Returns (ts [K0], q [K0,4],
    p [K0,3]) — the refined trajectory over the sequencer's rows.

    ``imu_*``: the full raw IMU stream of the run (host arrays; the
    sequencer's own ring buffer only keeps the trailing
    imu_max_buffer_duration seconds). ``mesh``: a 'wp' mesh from
    window_shard.make_wp_mesh (default: single device).
    """
    import jax
    import jax.numpy as jnp

    from mimosa_tpu.core import lie
    from mimosa_tpu.graph import window as win
    from mimosa_tpu.imu import preintegration as pre
    from mimosa_tpu.imu.buffer import ImuBuffer
    from mimosa_tpu.parallel import window_shard as ws

    s = sequencer
    ts = np.asarray(s._traj_ts, np.float64)
    K0 = len(ts)
    if K0 < 3:
        raise ValueError("nothing to smooth: trajectory too short")
    if K0 > max_states:
        raise ValueError(f"{K0} states > max_states={max_states}; raise "
                         f"the cap or smooth in chunks")
    dtype = s.window.p.dtype
    n = K0
    # jitted-fetch reads: well-defined copies of donated-chain arrays,
    # but on a tunneled relay these readbacks still downgrade the
    # session (sequencer._host_fetch docstring) — smooth() is an
    # END-OF-REPLAY operation; calling it mid-run pins every later
    # replay in the process at ~41 scans/s
    from mimosa_tpu.graph.sequencer import _host_fetch
    q_est = _host_fetch(s.traj_q).astype(np.float64)[:n]
    p_est = _host_fetch(s.traj_p).astype(np.float64)[:n]
    H6 = s.pose_info_records().astype(np.float64)          # [K0,6,6]
    # rows without a scan registration (declared by radar/odometry, or a
    # scan whose quadratic never reached them) get a WEAK anchor at their
    # replay pose: keeps the batch problem anchored everywhere (the gauge
    # would otherwise float on long scan-free stretches) while any real
    # scan information dominates it by orders of magnitude
    weak = np.diag(np.concatenate([
        np.full(3, 1.0 / weak_sigma_rot ** 2),
        np.full(3, 1.0 / weak_sigma_pos ** 2)]))
    no_info = np.abs(H6).max(axis=(1, 2)) < 1e-9
    H6[no_info] = weak

    # mesh + pad K to a multiple of n_wp (>=2 states per shard); padded
    # states repeat the last row with dead IMU segments and zero
    # measurements — damping keeps their (decoupled) blocks solvable
    mesh = mesh or ws.make_wp_mesh(1)
    n_wp = mesh.shape["wp"]
    K = max(2 * n_wp, -(-K0 // n_wp) * n_wp)
    pad = K - K0

    def padded(a, axis0=K0):
        reps = (pad,) + (1,) * (a.ndim - 1)
        return np.concatenate([a, np.tile(a[-1:], reps)], axis=0)

    q0 = jnp.asarray(padded(q_est), dtype)
    p0 = jnp.asarray(padded(p_est), dtype)
    # central-difference velocity seed
    v_est = np.zeros_like(p_est)
    v_est[1:-1] = (p_est[2:] - p_est[:-2]) / \
        np.maximum(ts[2:] - ts[:-2], 1e-3)[:, None]
    v_est[0] = v_est[1]
    v_est[-1] = v_est[-2]
    v0 = jnp.asarray(padded(v_est), dtype)
    bg0 = jnp.zeros((K, 3), dtype)
    ba0 = jnp.zeros((K, 3), dtype)
    g_dir = jnp.asarray(_host_fetch(s.window.g_dir), dtype)

    # re-preintegrate the IMU chain between consecutive rows
    buf = ImuBuffer(max_duration=float(ts[-1] - ts[0]) + 10.0,
                    acc_scale=s.cfg.imu_acc_scale)
    buf.add_batch(np.asarray(imu_ts, np.float64), np.asarray(imu_acc),
                  np.asarray(imu_gyro))
    M = max_imu_per_segment
    accs = np.zeros((K - 1, M, 3), np.float32)
    gyrs = np.zeros((K - 1, M, 3), np.float32)
    dts = np.zeros((K - 1, M), np.float32)
    seg_ok = np.zeros((K - 1, M), bool)
    fv = np.zeros(K - 1, bool)
    for i in range(K0 - 1):
        _, a, g, dt, vd, nn = buf.segment(ts[i], ts[i + 1], M)
        accs[i], gyrs[i], dts[i], seg_ok[i] = a, g, dt, vd
        fv[i] = nn >= 2

    z3 = jnp.zeros(3, dtype)

    def preint_one(a, g, dt, vd):
        return pre.preintegrate(jnp.asarray(a, dtype), jnp.asarray(g, dtype),
                                jnp.asarray(dt, dtype), z3, z3,
                                s.cfg.acc_var, s.cfg.gyro_var,
                                int_var=s.cfg.int_var, valid=vd)

    # jitted: eager dispatches poison the tunneled-TPU relay session
    preints = jax.jit(jax.vmap(preint_one))(
        jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
        jnp.asarray(seg_ok))
    fv = jnp.asarray(fv)

    # pose-measurement quadratics: anchor each row at its replay pose with
    # the scan's own information matrix (zeros for sensor rows without one)
    SD = win.SD
    # pad rows carry ZERO measurement information (their IMU segments are
    # dead too, so they stay decoupled and damping pins their dx at 0)
    H6p = jnp.asarray(np.concatenate(
        [H6, np.zeros((pad, 6, 6))], axis=0), dtype)
    q_meas = q0
    p_meas = p0
    cfg = win.WindowConfig(K=K, damping=1e-6,
                           sigma_bg_rw=s.win_cfg.sigma_bg_rw,
                           sigma_ba_rw=s.win_cfg.sigma_ba_rw,
                           g_mag=s.cfg.g_mag,
                           init_sigma_rot=s.win_cfg.init_sigma_rot,
                           init_sigma_pos=s.win_cfg.init_sigma_pos,
                           init_sigma_vel=0.5,
                           init_sigma_bg=s.win_cfg.init_sigma_bg,
                           init_sigma_ba=s.win_cfg.init_sigma_ba,
                           init_sigma_grav=s.win_cfg.init_sigma_grav)

    def meas_fn(q, p, v, bg, ba, g):
        def one(qk, pk, qm, pm, h6):
            r = lie.se3_local(qm, pm, qk, pk)
            H = jnp.zeros((SD, SD), dtype).at[
                jnp.arange(6)[:, None], jnp.arange(6)[None, :]].add(h6)
            b = jnp.zeros(SD, dtype).at[:6].set(h6 @ r)
            return H, b
        return jax.vmap(one)(q, p, q_meas, p_meas, H6p)

    q, p, _, _, _, _ = ws.batch_adjust(
        mesh, q0, p0, v0, bg0, ba0, g_dir, preints, fv, meas_fn, cfg,
        iters=iters)
    return ts, np.asarray(q[:K0], np.float64), np.asarray(p[:K0],
                                                          np.float64)
