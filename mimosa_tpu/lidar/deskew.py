"""Motion compensation (deskew) of a LiDAR scan via IMU replay.

TPU-native equivalent of the reference's ``lidar::Manager::deskewPoints``
(reference src/lidar/manager.cpp:385-512): replay the IMU across the scan,
giving a closed-form pose at every point's timestamp (constant acc/omega
within each IMU interval, including the gravity term, :469-492), then
transform all points into the scan-end LiDAR frame ``Le`` (:494-509).

Instead of grouping points by unique timestamp and looping (host-style),
every point gets a fused gather + closed-form interpolation — one batched
kernel over the padded scan. The per-point relative transform
``T_Le_Lt`` is also returned for the photometric module's re-distortion
(ref interpolated_map_T_Le_Lt_ cache, manager.cpp:501-507).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mimosa_tpu.core import lie


class DeskewResult(NamedTuple):
    points_le: jnp.ndarray   # [N,3] points in scan-end lidar frame
    q_le_lt: jnp.ndarray     # [N,4] per-point rotation Le <- Lt
    t_le_lt: jnp.ndarray     # [N,3] per-point translation Le <- Lt
    q_w_be: jnp.ndarray      # [4] body pose at scan end (world)
    p_w_be: jnp.ndarray      # [3]
    v_w_be: jnp.ndarray      # [3]


def integrate_imu_poses(q0, p0, v0, accs, gyros, ts, bg, ba, gravity,
                        t_end):
    """Integrate body states at each IMU sample time — associative-scan
    formulation (same math as the naive sequential replay, reference
    manager.cpp:469-492 const-acc/omega-per-interval incl. gravity, but in
    log2(M) parallel rounds: gravity-free preintegration prefixes + the
    closed-form gravity terms).

    ts: [M] absolute sample times (padded tail must be >= t_end and
    monotonic); the state at ts[i] is returned for every i, integrating with
    constant (acc, gyro) over [ts[i], ts[i+1]].
    Returns (qs [M,4], ps [M,3], vs [M,3]) with state i AT time ts[i].
    """
    from mimosa_tpu.imu import preintegration as pre

    dtype = accs.dtype
    # clamp + monotonicity so padded tail samples (repeat-last convention)
    # contribute zero integration time and the final state lands at t_end
    ts = jax.lax.cummax(jnp.minimum(ts, t_end))
    dts = jnp.maximum(jnp.diff(ts, append=jnp.asarray(t_end)[None]), 0.0)

    pref = pre.preintegrate(accs, gyros, dts, bg, ba, 0.0, 0.0, 0.0,
                            return_prefixes=True)
    R0 = lie.quat_to_mat(q0)
    qid = jnp.broadcast_to(lie.quat_identity(dtype), (1, 4))
    # state i composes samples 0..i-1 -> shift the prefixes right by one
    dq = jnp.concatenate([qid, pref.dq[:-1]])
    dv = jnp.concatenate([jnp.zeros((1, 3), dtype), pref.dv[:-1]])
    dp = jnp.concatenate([jnp.zeros((1, 3), dtype), pref.dp[:-1]])
    ti = jnp.concatenate([jnp.zeros(1, dtype), pref.dt[:-1]])[:, None]

    qs = lie.quat_mul(jnp.broadcast_to(q0, dq.shape), dq)
    vs = v0 + gravity * ti + dv @ R0.T
    ps = p0 + v0 * ti + 0.5 * gravity * ti * ti + dp @ R0.T

    # end state at t_end = full composition
    tN = pref.dt[-1]
    q_e = lie.quat_mul(q0, pref.dq[-1])
    v_e = v0 + gravity * tN + R0 @ pref.dv[-1]
    p_e = p0 + v0 * tN + 0.5 * gravity * tN * tN + R0 @ pref.dp[-1]
    return qs, ps, vs, (q_e, p_e, v_e)


def deskew(points, t_pts, valid, q0, p0, v0, accs, gyros, imu_ts, bg, ba,
           gravity, q_b_l, t_b_l, t_end) -> DeskewResult:
    """Deskew ``points`` [N,3] (lidar frame, timestamps ``t_pts`` [N] absolute)
    into the scan-end lidar frame.

    (q0,p0,v0): body state in world at ``imu_ts[0]`` (<= first point time).
    accs/gyros/imu_ts: [M] padded IMU samples covering the scan (pad the tail
    by repeating the last sample with ts >= t_end). (q_b_l, t_b_l): lidar
    extrinsics T_B_L. t_end: scan-end timestamp.
    """
    qs, ps, vs, (q_e, p_e, v_e) = integrate_imu_poses(
        q0, p0, v0, accs, gyros, imu_ts, bg, ba, gravity, t_end)

    # Pose at each point's timestamp. The reference groups points by unique
    # timestamp and replays serially (manager.cpp:339-370,459-509); here a
    # fixed grid of NB time buckets is precomputed (closed-form within the
    # owning IMU interval) and every point gathers its bucket pose — one
    # [NB] computation + per-point gathers instead of per-point
    # searchsorted/expmap. Bucket spacing t_end/NB (~0.1 ms for a 10 Hz
    # scan) is far below IMU-interval scale, so the approximation error is
    # orders below sensor noise.
    NB = 1024
    dtype = points.dtype
    ts_c = jax.lax.cummax(jnp.minimum(imu_ts, t_end))
    tb = ts_c[0] + jnp.linspace(jnp.asarray(0.0, dtype),
                                jnp.asarray(1.0, dtype), NB) \
        * (t_end - ts_c[0])
    bi = jnp.clip(jnp.searchsorted(ts_c, tb, side="right") - 1,
                  0, ts_c.shape[0] - 1)
    db = jnp.clip(tb - ts_c[bi], 0.0, None)[:, None]
    qb_base = qs[bi]
    a_wb = lie.quat_rotate(qb_base, accs[bi] - ba) + gravity
    p_b = ps[bi] + vs[bi] * db + 0.5 * a_wb * db * db
    q_b = lie.quat_mul(qb_base, lie.exp_so3((gyros[bi] - bg) * db))

    # per-point: linear interpolation between neighboring buckets (nlerp on
    # the ~1e-4 rad inter-bucket rotation is exact to second order)
    span = jnp.maximum(t_end - ts_c[0], 1e-9)
    f = jnp.clip((t_pts - ts_c[0]) / span * (NB - 1), 0.0, NB - 1 - 1e-6)
    i0 = f.astype(jnp.int32)
    a = (f - i0)[:, None]
    p_t = (1.0 - a) * p_b[i0] + a * p_b[i0 + 1]
    q_raw = (1.0 - a) * q_b[i0] + a * q_b[i0 + 1]
    q_t = q_raw / jnp.linalg.norm(q_raw, axis=-1, keepdims=True)

    # T_W_Lt = T_W_Bt * T_B_L ; T_Le_Lt = (T_W_Le)^-1 * T_W_Lt
    q_w_lt, t_w_lt = lie.se3_compose(q_t, p_t, q_b_l, t_b_l)
    q_w_le, t_w_le = lie.se3_compose(q_e, p_e, q_b_l, t_b_l)
    q_le_w, t_le_w = lie.se3_inverse(q_w_le, t_w_le)
    q_rel, t_rel = lie.se3_compose(q_le_w, t_le_w, q_w_lt, t_w_lt)

    pts_le = lie.se3_transform(q_rel, t_rel, points)
    pts_le = jnp.where(valid[:, None], pts_le, 0.0)
    return DeskewResult(pts_le, q_rel, t_rel, q_e, p_e, v_e)
