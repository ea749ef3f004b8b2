"""Radar radial-speed (Doppler) factor, batched over targets.

TPU-native equivalent of the reference's ``DopplerHessianFactor``
(reference include/mimosa/radar/factor.hpp:23-188, RA-L 2024 radar velocity
factors): per radar target with unit bearing ``d`` (radar frame) and
measured radial speed ``vr``,

    v_R = R_BR^T (R_WB^T v_W + (omega - b_g) x t_BR)
    e   = -(d . v_R) - vr                       (factor.hpp:98-139)

keys: body attitude (via R_WB), world velocity, gyro bias — the
[dR, dv, dbg] tangent block of one window state. Robust Cauchy weight with
c = 2.3849 (factor.hpp:160-162). Jacobians come from one vmapped jacfwd
over the 9-dof tangent — fused by XLA with the residual evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mimosa_tpu.core import lie


@dataclasses.dataclass(frozen=True)
class RadarConfig:
    sigma: float = 0.15               # radial speed noise [m/s]
    cauchy_c: float = 2.3849          # ref factor.hpp:160
    # target filters (ref src/radar/manager.cpp:140-174)
    min_snr_db: float = 5.0
    min_range: float = 0.5
    max_range: float = 60.0
    max_azimuth: float = 0.9          # rad, cone half-angle
    max_elevation: float = 0.9
    use_to_init: bool = False         # may this sensor trigger initialization
    # extrinsics T_B_R
    q_b_r: tuple = (1.0, 0.0, 0.0, 0.0)
    t_b_r: tuple = (0.0, 0.0, 0.0)


class DopplerResult(NamedTuple):
    H: jnp.ndarray           # [9,9] over [dR, dv, dbg]
    b: jnp.ndarray           # [9]
    num_inlier: jnp.ndarray
    mean_abs_res: jnp.ndarray


def residuals(q_wb, v_w, bg, omega_b, dirs_r, doppler, cfg: RadarConfig):
    """e [N] for targets with unit bearings dirs_r [N,3] (radar frame) and
    measured radial speeds doppler [N]. omega_b: gyro measurement [3]."""
    d = q_wb.dtype
    q_br = jnp.asarray(cfg.q_b_r, d)
    t_br = jnp.asarray(cfg.t_b_r, d)
    v_b = lie.quat_rotate(lie.quat_conj(q_wb), v_w)
    v_lever = jnp.cross(omega_b - bg, t_br)
    v_r = lie.quat_rotate(lie.quat_conj(q_br), v_b + v_lever)
    return -(dirs_r @ v_r) - doppler


def linearize(q_wb, v_w, bg, omega_b, dirs_r, doppler, valid,
              cfg: RadarConfig) -> DopplerResult:
    """Accumulate the whitened, Cauchy-weighted 9x9 Hessian block."""
    dtype = q_wb.dtype
    z9 = jnp.zeros(9, dtype)

    def res_fn(xi):
        q2 = lie.quat_mul(q_wb, lie.exp_so3(xi[:3]))
        v2 = v_w + xi[3:6]
        bg2 = bg + xi[6:9]
        return residuals(q2, v2, bg2, omega_b, dirs_r, doppler, cfg)

    r = res_fn(z9)
    J = jax.jacfwd(res_fn)(z9)          # [N,9]

    c = cfg.cauchy_c
    w_rob = 1.0 / (1.0 + (r / (c * cfg.sigma)) ** 2)
    w = jnp.where(valid, w_rob, 0.0) / (cfg.sigma ** 2)
    H = jnp.einsum("ni,nj,n->ij", J, J, w)
    b = jnp.einsum("ni,n->i", J, w * r)
    m = valid.astype(dtype)
    return DopplerResult(H, b, jnp.sum(valid.astype(jnp.int32)),
                         jnp.sum(jnp.abs(r) * m) / jnp.maximum(jnp.sum(m), 1.0))


def filter_targets(points_r, snr_db, cfg: RadarConfig):
    """Per-target validity gates (NaN / SNR / range / azimuth / elevation
    cones — ref radar/manager.cpp:140-174). Returns (unit dirs, ranges,
    valid)."""
    finite = jnp.isfinite(points_r).all(-1)
    # sanitize BEFORE any arithmetic: NaN rows would otherwise poison the
    # masked Hessian accumulation (0 * NaN = NaN)
    points_r = jnp.where(finite[:, None], points_r, 1.0)
    rng = jnp.linalg.norm(points_r, axis=-1)
    safe = jnp.maximum(rng, 1e-6)
    dirs = points_r / safe[:, None]
    az = jnp.arctan2(points_r[:, 1], points_r[:, 0])
    el = jnp.arcsin(jnp.clip(points_r[:, 2] / safe, -1, 1))
    valid = (finite & (snr_db >= cfg.min_snr_db) & (rng >= cfg.min_range)
             & (rng <= cfg.max_range) & (jnp.abs(az) <= cfg.max_azimuth)
             & (jnp.abs(el) <= cfg.max_elevation))
    return dirs, rng, valid
