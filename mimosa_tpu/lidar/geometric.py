"""Geometric scan-to-map point-to-plane ICP linearization, batched.

The TPU-native equivalent of the reference's ``ICPFactor::linearize``
(reference include/mimosa/lidar/geometric_factor.hpp:231-561) — the
dominant hot kernel. Differences by design, not omission:

* correspondence = voxel-hash stencil lookup of *precomputed* per-voxel
  planes (mapping/voxel_hash.py) instead of kNN=5 + per-query plane fit
  with correspondence caching (geometric_factor.hpp:280-317): on TPU it is
  cheaper to re-gather the plane for every point every GN iteration than
  to maintain data-dependent caches;
* the OpenMP 4-thread reduction (geometric_factor.hpp:261-275) becomes a
  single fused vmap + masked sum that XLA maps onto the VPU;
* rejection statuses become mask bitfields preserving the reference's
  debug counters (geometric.cpp:280-323).

Reproduced semantics: point-to-plane residual with Huber robust weight
(geometric_factor.hpp:332-337), the FAST-LIO-style s-score gate
``1 - 0.9|e|/sqrt(|p|) >= s_min`` (:319-328), analytic 1x6 Jacobian
(:341-348), 6x6 Hessian accumulation (:559-561), localizability
eigen-analysis with the 0.5 per-point projection cutoff (:405-457),
optional 4-DoF gravity-aligned projection (:255-259,464-475) and
degeneracy projection of updates onto the non-degenerate eigen-subspace
(:477-557).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mimosa_tpu.core import lie
from mimosa_tpu.core.eigh3 import eigh3
from mimosa_tpu.mapping import voxel_hash as vh

# rejection status indices (debug counters, ref LidarGeometricDebug.msg)
STATUS_INLIER = 0
STATUS_NO_PLANE = 1
STATUS_MAX_DIST = 2
STATUS_S_GATE = 3
NUM_STATUS = 4


@dataclasses.dataclass(frozen=True)
class GeometricConfig:
    sigma: float = 0.05               # point-to-plane noise stdev [m]
    huber_delta: float = 0.1          # Huber kernel threshold on |r| [m]
    s_gate_min: float = 0.9           # s-score gate (ref :319-328)
    max_p2p_dist: float = 0.5         # hard residual gate [m]
    loc_proj_cutoff: float = 0.5      # per-point |J·v| cutoff (ref :443)
    loc_count_thresh: float = 120.0   # min #strong points per trans axis
    # the reference keeps separate rot/trans thresholds (degen_thresh_rot /
    # degen_thresh_trans, geometric_config.hpp:31-32; its configs even set
    # rot to 0 = rotation never flagged degenerate)
    loc_count_thresh_rot: float = 120.0
    use_4dof: bool = False            # project out world roll/pitch
    project_degenerate: bool = False  # zero GN update in weak directions


class ICPResult(NamedTuple):
    H: jnp.ndarray            # [6,6] sum w J^T J / sigma^2 (tangent [dR, dt])
    b: jnp.ndarray            # [6]   sum w J^T r / sigma^2
    num_inlier: jnp.ndarray   # scalar int
    status_counts: jnp.ndarray  # [NUM_STATUS] int32
    mean_abs_res: jnp.ndarray   # scalar, inlier mean |r|
    loc_counts_rot: jnp.ndarray   # [3] strong-point counts per rot eigvec
    loc_counts_trans: jnp.ndarray  # [3]
    eigvals_rot: jnp.ndarray      # [3] ascending, of H rot block
    eigvals_trans: jnp.ndarray    # [3]
    eigvecs_rot: jnp.ndarray      # [3,3] columns
    eigvecs_trans: jnp.ndarray    # [3,3]
    degenerate_rot: jnp.ndarray   # [3] bool per eigen axis
    degenerate_trans: jnp.ndarray  # [3]


def match(vmap_: vh.VoxelMap, points_b, q, t, map_cfg: vh.VoxelMapConfig):
    """Correspondence search: per-point nearest valid plane at pose (q, t).
    Returns (normal [N,3], mean [N,3], found [N]).

    Splitting this out lets the GN loop reuse correspondences across
    iterations — the TPU analogue of the reference's correspondence cache
    (geometric_factor.hpp:280-317 re-searches only points that moved more
    than min_dist_in_voxel/4; pose updates within one scan's GN are
    millimetric, so a single association per scan is the same trade)."""
    R = lie.quat_to_mat(q)
    p_w = points_b @ R.T + t
    return vh.query_planes(vmap_, p_w, map_cfg)


def linearize_with(matches, points_b, valid, q, t, cfg: GeometricConfig,
                   g_dir=None, return_inlier=False) -> ICPResult:
    """ICP linearization against fixed correspondences ``matches`` =
    (normal, mean, found) from :func:`match`. With ``return_inlier`` also
    returns the per-point inlier mask (the marker/overlay renderers in
    io/viz.py need it; the reference draws its correspondence markers from
    the same per-point statuses, geometric.cpp:330-425)."""
    dtype = points_b.dtype
    R = lie.quat_to_mat(q)
    p_w = points_b @ R.T + t
    normal, mean, found = matches
    r = jnp.sum(normal * (p_w - mean), axis=-1)

    # gates
    in_dist = jnp.abs(r) <= cfg.max_p2p_dist
    pn = jnp.sqrt(jnp.linalg.norm(points_b, axis=-1) + 1e-12)
    s = 1.0 - 0.9 * jnp.abs(r) / pn
    in_s = s >= cfg.s_gate_min
    inlier = valid & found & in_dist & in_s

    # Huber weight
    ar = jnp.abs(r)
    w_huber = jnp.where(ar <= cfg.huber_delta, 1.0,
                        cfg.huber_delta / jnp.maximum(ar, 1e-12))
    w = jnp.where(inlier, w_huber, 0.0) / (cfg.sigma ** 2)

    # Jacobian rows: dr/d(dR) = n^T (-R [p_B]x) = (p_B x R^T n)^T
    nR = normal @ R                       # rows are R^T n
    j_rot = jnp.cross(points_b, nR)
    j_trans = nR
    J = jnp.concatenate([j_rot, j_trans], axis=-1)  # [N,6]

    H = jnp.einsum("ni,nj,n->ij", J, J, w)
    b = jnp.einsum("ni,n->i", J, w * r)

    # status counters
    st_no_plane = valid & ~found
    st_dist = valid & found & ~in_dist
    st_sgate = valid & found & in_dist & ~in_s
    counts = jnp.stack([
        jnp.sum(inlier), jnp.sum(st_no_plane), jnp.sum(st_dist),
        jnp.sum(st_sgate),
    ]).astype(jnp.int32)

    # localizability (ref geometric_factor.hpp:405-457): eigen-analysis of
    # the unwhitened J^T J blocks + per-point projections with 0.5 cutoff
    m = inlier.astype(dtype)
    Hrr = jnp.einsum("ni,nj,n->ij", j_rot, j_rot, m)
    Htt = jnp.einsum("ni,nj,n->ij", j_trans, j_trans, m)
    lam_r, V_r = eigh3(Hrr)
    lam_t, V_t = eigh3(Htt)
    proj_r = jnp.abs(j_rot @ V_r)         # [N,3]
    proj_t = jnp.abs(j_trans @ V_t)
    cnt_r = jnp.sum((proj_r >= cfg.loc_proj_cutoff) & inlier[:, None], axis=0)
    cnt_t = jnp.sum((proj_t >= cfg.loc_proj_cutoff) & inlier[:, None], axis=0)
    degen_r = cnt_r < cfg.loc_count_thresh_rot
    degen_t = cnt_t < cfg.loc_count_thresh

    mean_abs = jnp.sum(ar * m) / jnp.maximum(jnp.sum(m), 1.0)

    if cfg.use_4dof and g_dir is not None:
        # remove global roll/pitch: world rotations about axes ⊥ gravity map
        # to body-tangent directions R^T h; keep only yaw (about g_dir).
        a_body = R.T @ g_dir              # yaw axis in body tangent space
        a_body = a_body / jnp.maximum(jnp.linalg.norm(a_body), 1e-9)
        P_rot = jnp.outer(a_body, a_body)  # keep-yaw projector
        P = jnp.zeros((6, 6), dtype).at[:3, :3].set(P_rot)
        P = P.at[3:, 3:].set(jnp.eye(3, dtype=dtype))
        H = P @ H @ P.T
        b = P @ b

    res = ICPResult(H, b, counts[0], counts, mean_abs,
                    cnt_r, cnt_t, lam_r, lam_t, V_r, V_t, degen_r, degen_t)
    return (res, inlier) if return_inlier else res


def linearize(vmap_: vh.VoxelMap, points_b, valid, q, t,
              map_cfg: vh.VoxelMapConfig, cfg: GeometricConfig,
              g_dir=None) -> ICPResult:
    """One ICP linearization of the unary scan-to-map factor: fresh
    correspondence search + linearization (match + linearize_with).

    points_b: [N,3] downsampled scan points in **body** frame (already
    deskewed and transformed by T_B_L, ref geometric.cpp:128-183).
    (q, t): current body->world pose estimate. g_dir: unit gravity direction
    in world (needed only for 4-DoF mode).

    Tangent convention matches se3_retract: xi = [dR, dt] with
    p_W = R Exp(dR) (p_B) + t + R dt, so
      dr/d(dR) = -n^T R [p_B]x,   dr/d(dt) = n^T R.
    """
    m = match(vmap_, points_b, q, t, map_cfg)
    return linearize_with(m, points_b, valid, q, t, cfg, g_dir=g_dir)


class BinaryICPResult(NamedTuple):
    """Two-key scan-to-scan point-to-plane block, tangent layout
    [xi_source(6), xi_target(6)] (each [dR, dt] body-frame right)."""

    H: jnp.ndarray             # [12,12]
    b: jnp.ndarray             # [12]
    num_inlier: jnp.ndarray
    status_counts: jnp.ndarray  # [NUM_STATUS]
    mean_abs_res: jnp.ndarray


def linearize_binary(vmap_t: vh.VoxelMap, points_src_b, valid, q_s, t_s,
                     q_t, t_t, map_cfg: vh.VoxelMapConfig,
                     cfg: GeometricConfig) -> BinaryICPResult:
    """Binary scan-to-scan ICP factor: source points registered against a
    voxel map expressed in the TARGET state's body frame, constraining
    BOTH poses (the reference's two-key ICPFactor ctor,
    geometric_factor.hpp:131-141; its runtime never constructs it, but the
    API is part of the factor surface). The unary factor is the special
    case T_target = identity with a world-frame map.

    With delta = T_t^-1 T_s and y = dR p + dt (the source point in the
    target frame), the residual r = n.(y - mu) has the rows
      d r/d xi_s = [ p x (dR^T n),  dR^T n ]      (= unary rows with
                                                   R -> dR)
      d r/d xi_t = [ n x y,        -n ]
    so a common rigid motion of both states is in the null space (the
    relative measurement fixes no gauge). Gates/weights are identical to
    :func:`linearize_with`, guarded by the identity-target equality test
    (tests/test_binary_factors.py)."""
    dtype = points_src_b.dtype
    qi, ti = lie.se3_inverse(q_t, t_t)
    q_d, t_d = lie.se3_compose(qi, ti, q_s, t_s)
    Rd = lie.quat_to_mat(q_d)
    y = points_src_b @ Rd.T + t_d

    normal, mean, found = vh.query_planes(vmap_t, y, map_cfg)
    r = jnp.sum(normal * (y - mean), axis=-1)

    # gates — same as linearize_with
    in_dist = jnp.abs(r) <= cfg.max_p2p_dist
    pn = jnp.sqrt(jnp.linalg.norm(points_src_b, axis=-1) + 1e-12)
    s = 1.0 - 0.9 * jnp.abs(r) / pn
    in_s = s >= cfg.s_gate_min
    inlier = valid & found & in_dist & in_s
    ar = jnp.abs(r)
    w_huber = jnp.where(ar <= cfg.huber_delta, 1.0,
                        cfg.huber_delta / jnp.maximum(ar, 1e-12))
    w = jnp.where(inlier, w_huber, 0.0) / (cfg.sigma ** 2)

    a = normal @ Rd                       # rows are dR^T n
    J = jnp.concatenate([
        jnp.cross(points_src_b, a), a,    # source block
        jnp.cross(normal, y), -normal,    # target block
    ], axis=-1)                           # [N,12]
    H = jnp.einsum("ni,nj,n->ij", J, J, w)
    b = jnp.einsum("ni,n->i", J, w * r)

    st_no_plane = valid & ~found
    st_dist = valid & found & ~in_dist
    st_sgate = valid & found & in_dist & ~in_s
    counts = jnp.stack([
        jnp.sum(inlier), jnp.sum(st_no_plane), jnp.sum(st_dist),
        jnp.sum(st_sgate),
    ]).astype(jnp.int32)
    m = inlier.astype(dtype)
    mean_abs = jnp.sum(ar * m) / jnp.maximum(jnp.sum(m), 1.0)
    return BinaryICPResult(H, b, counts[0], counts, mean_abs)


def degenerate_selector(res: ICPResult, dtype=None):
    """6x6 selector keeping ONLY the degenerate eigen directions — the
    VSV^T matrix through which the reference projects the unary photometric
    factor so intensity information acts only where geometry is weak
    (ref photometric_factor.hpp:101-116,339-353)."""
    dtype = dtype or res.H.dtype
    keep_r = res.degenerate_rot.astype(dtype)
    keep_t = res.degenerate_trans.astype(dtype)
    P_r = (res.eigvecs_rot * keep_r[None, :]) @ res.eigvecs_rot.T
    P_t = (res.eigvecs_trans * keep_t[None, :]) @ res.eigvecs_trans.T
    P = jnp.zeros((6, 6), dtype)
    return P.at[:3, :3].set(P_r).at[3:, 3:].set(P_t)


def degeneracy_projector(res: ICPResult, dtype=None):
    """6x6 projector P zeroing GN-update components along degenerate eigen
    directions (ref geometric_factor.hpp:477-557 re-expressed as an update-
    space projection instead of per-point Jacobian surgery)."""
    dtype = dtype or res.H.dtype
    keep_r = (~res.degenerate_rot).astype(dtype)
    keep_t = (~res.degenerate_trans).astype(dtype)
    P_r = (res.eigvecs_rot * keep_r[None, :]) @ res.eigvecs_rot.T
    P_t = (res.eigvecs_trans * keep_t[None, :]) @ res.eigvecs_trans.T
    P = jnp.zeros((6, 6), dtype)
    P = P.at[:3, :3].set(P_r).at[3:, 3:].set(P_t)
    return P
