"""Pallas TPU kernel: fused point-to-plane ICP residual/Jacobian reduction.

The hot inner loop of the ICP factor (reference ICPFactor::linearize,
geometric_factor.hpp:231-561) as one hand-written kernel: for a block of
points resident in VMEM, compute the transformed point, point-to-plane
residual, gates (max-dist, s-score), Huber weight and the analytic [6]
Jacobian row, and accumulate the 21 upper-triangle entries of the weighted
6x6 Hessian, the 6-vector gradient, the unweighted rot/trans localizability
blocks and the status counts — all without materializing any [N,6]
intermediate in HBM.

Data layout: planar [8, NB, 128] float32 (component-major), because TPU
tiles want a 128 lane dimension; the wrapper reshapes from the usual
[N, 3] arrays. Correspondence gathers stay in XLA (Mosaic has no
cross-tile row gather — measured and documented in CLAUDE.md), so this
kernel consumes pre-matched plane arrays from ``geo.match``.

Accumulation: grid steps over point blocks write into one VMEM scratch
accumulator tile [8, 128] (slots hold H/b/loc/count sums) that the final
step copies to the output — a single-pass reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimosa_tpu.core import lie
from mimosa_tpu.core.eigh3 import eigh3
from mimosa_tpu.lidar import geometric as geo

# accumulator slot layout inside the [8,128] output tile (row 0 used)
_NH = 21          # upper triangle of weighted H
_NB = 6           # gradient
_NR = 6           # unweighted rot-block upper triangle (localizability)
_NT = 6           # unweighted trans-block upper triangle
_NC = 4           # status counts
_NM = 2           # sum |r|, sum inlier
_TOT = _NH + _NB + _NR + _NT + _NC + _NM  # 45


def _triu_pairs(n):
    return [(i, j) for i in range(n) for j in range(i, n)]


def _kernel(scal_ref, pts_ref, nrm_ref, mean_ref, flags_ref, out_ref,
            acc_ref, *, n_blocks, sigma, huber_delta, s_gate_min,
            max_p2p_dist):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        for i in range(_TOT):
            acc_ref[i] = 0.0

    # R row-major [9], t [3] from SMEM scalars
    R = [scal_ref[i] for i in range(9)]
    t = [scal_ref[9 + i] for i in range(3)]

    px = pts_ref[0]
    py = pts_ref[1]
    pz = pts_ref[2]
    nx = nrm_ref[0]
    ny = nrm_ref[1]
    nz = nrm_ref[2]
    mx = mean_ref[0]
    my = mean_ref[1]
    mz = mean_ref[2]
    fl = flags_ref[0]                     # 1.0 = valid & found, 0.0 else
    found = flags_ref[1]                  # 1.0 = plane found (for counts)
    valid = flags_ref[2]

    # world point
    wx = R[0] * px + R[1] * py + R[2] * pz + t[0]
    wy = R[3] * px + R[4] * py + R[5] * pz + t[1]
    wz = R[6] * px + R[7] * py + R[8] * pz + t[2]

    r = nx * (wx - mx) + ny * (wy - my) + nz * (wz - mz)
    ar = jnp.abs(r)
    in_dist = (ar <= max_p2p_dist).astype(jnp.float32)
    pn = jnp.sqrt(jnp.sqrt(px * px + py * py + pz * pz) + 1e-12)
    s = 1.0 - 0.9 * ar / pn
    in_s = (s >= s_gate_min).astype(jnp.float32)
    inlier = fl * in_dist * in_s
    w_h = jnp.where(ar <= huber_delta, 1.0, huber_delta / jnp.maximum(ar, 1e-12))
    w = inlier * w_h / (sigma * sigma)

    # nR = R^T n ; j_rot = p x nR ; j_trans = nR
    nRx = R[0] * nx + R[3] * ny + R[6] * nz
    nRy = R[1] * nx + R[4] * ny + R[7] * nz
    nRz = R[2] * nx + R[5] * ny + R[8] * nz
    J = [py * nRz - pz * nRy,
         pz * nRx - px * nRz,
         px * nRy - py * nRx,
         nRx, nRy, nRz]

    st_no_plane = valid * (1.0 - found)
    st_dist = valid * found * (1.0 - in_dist)
    st_sgate = valid * found * in_dist * (1.0 - in_s)

    sums = []
    for (i, j) in _triu_pairs(6):
        sums.append(jnp.sum(w * J[i] * J[j]))
    for i in range(6):
        sums.append(jnp.sum(w * J[i] * r))
    for (i, j) in _triu_pairs(3):
        sums.append(jnp.sum(inlier * J[i] * J[j]))
    for (i, j) in _triu_pairs(3):
        sums.append(jnp.sum(inlier * J[3 + i] * J[3 + j]))
    for v in (inlier, st_no_plane, st_dist, st_sgate):
        sums.append(jnp.sum(v))
    sums.append(jnp.sum(ar * inlier))
    sums.append(jnp.sum(inlier))

    # scalar accumulation in SMEM (value-scatter is not lowerable on TPU)
    for i, s_val in enumerate(sums):
        acc_ref[i] = acc_ref[i] + s_val

    @pl.when(k == n_blocks - 1)
    def _():
        for i in range(_TOT):
            out_ref[i] = acc_ref[i]


def _planar(a3, nb, blk):
    """[N,3] -> [3, nb, 128] planar layout (zero-padded)."""
    n = a3.shape[0]
    flat = jnp.zeros((3, nb * 128), a3.dtype)
    flat = flat.at[:, :n].set(a3.T)
    return flat.reshape(3, nb, 128)


@functools.partial(jax.jit, static_argnames=("cfg",))
def linearize_pallas(matches, points_b, valid, q, t, cfg):
    """Pallas-fused equivalent of geo.linearize_with. Returns ICPResult.

    (The localizability projection COUNTS still need the eigenvectors, so
    that light elementwise pass remains in XLA after the kernel.)
    """
    n = points_b.shape[0]
    assert n % 128 == 0, "pad points to a multiple of 128"
    nb_total = n // 128
    BLK = min(16, nb_total)              # rows of 128 per grid step
    n_blocks = pl.cdiv(nb_total, BLK)

    normal, mean, found = matches
    dtype = jnp.float32
    R = lie.quat_to_mat(q).astype(dtype)
    scal = jnp.concatenate([R.reshape(-1), t.astype(dtype)])

    pts_p = _planar(points_b.astype(dtype), nb_total, BLK)
    nrm_p = _planar(normal.astype(dtype), nb_total, BLK)
    mean_p = _planar(mean.astype(dtype), nb_total, BLK)
    fl = (valid & found).astype(dtype)
    flags = jnp.zeros((3, nb_total * 128), dtype)
    flags = flags.at[0, :n].set(fl)
    flags = flags.at[1, :n].set(found.astype(dtype))
    flags = flags.at[2, :n].set(valid.astype(dtype))
    flags_p = flags.reshape(3, nb_total, 128)

    kern = functools.partial(
        _kernel, n_blocks=n_blocks, sigma=cfg.sigma,
        huber_delta=cfg.huber_delta, s_gate_min=cfg.s_gate_min,
        max_p2p_dist=cfg.max_p2p_dist)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, BLK, 128), lambda k: (0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLK, 128), lambda k: (0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLK, 128), lambda k: (0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLK, 128), lambda k: (0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((_TOT,), dtype),
        scratch_shapes=[pltpu.SMEM((_TOT,), dtype)],
    )(scal, pts_p, nrm_p, mean_p, flags_p)

    acc = out
    s = 0
    H = jnp.zeros((6, 6), dtype)
    for (i, j) in _triu_pairs(6):
        H = H.at[i, j].set(acc[s])
        H = H.at[j, i].set(acc[s])
        s += 1
    b = acc[s:s + 6]
    s += 6
    Hrr = jnp.zeros((3, 3), dtype)
    for (i, j) in _triu_pairs(3):
        Hrr = Hrr.at[i, j].set(acc[s]).at[j, i].set(acc[s])
        s += 1
    Htt = jnp.zeros((3, 3), dtype)
    for (i, j) in _triu_pairs(3):
        Htt = Htt.at[i, j].set(acc[s]).at[j, i].set(acc[s])
        s += 1
    counts = acc[s:s + 4].astype(jnp.int32)
    s += 4
    sum_ar, sum_in = acc[s], acc[s + 1]
    mean_abs = sum_ar / jnp.maximum(sum_in, 1.0)

    lam_r, V_r = eigh3(Hrr)
    lam_t, V_t = eigh3(Htt)
    # per-point projection counts (needs V) — light XLA pass
    nR = normal.astype(dtype) @ R
    j_rot = jnp.cross(points_b.astype(dtype), nR)
    inl = (valid & found).astype(dtype)  # pre-gate approximation refined below
    # recompute exact inlier mask (same gates as the kernel)
    p_w = points_b.astype(dtype) @ R.T + t
    r = jnp.sum(normal * (p_w - mean), axis=-1)
    in_dist = jnp.abs(r) <= cfg.max_p2p_dist
    pn = jnp.sqrt(jnp.linalg.norm(points_b, axis=-1) + 1e-12)
    in_s = (1.0 - 0.9 * jnp.abs(r) / pn) >= cfg.s_gate_min
    inlier = valid & found & in_dist & in_s
    del inl
    cnt_r = jnp.sum((jnp.abs(j_rot @ V_r) >= cfg.loc_proj_cutoff)
                    & inlier[:, None], axis=0)
    cnt_t = jnp.sum((jnp.abs(nR @ V_t) >= cfg.loc_proj_cutoff)
                    & inlier[:, None], axis=0)
    degen_r = cnt_r < cfg.loc_count_thresh
    degen_t = cnt_t < cfg.loc_count_thresh

    return geo.ICPResult(H, b, counts[0], counts, mean_abs, cnt_r, cnt_t,
                         lam_r, lam_t, V_r, V_t, degen_r, degen_t)
