"""Closed-form eigendecomposition of symmetric 3x3 matrices, batched.

Used for per-voxel plane fits (covariance -> normal), ICP localizability
analysis of 6x6 Hessian rot/trans blocks (3x3 each), and degeneracy
projection — replacing the reference's per-call Eigen
``SelfAdjointEigenSolver`` (reference include/mimosa/lidar/
geometric_factor.hpp:176-229,405-457). Analytic (trigonometric) eigenvalues
plus cross-product eigenvectors: pure VPU element-wise work, no iteration —
exactly what a TPU wants for millions of tiny problems per scan.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvalsh3(A):
    """Eigenvalues of symmetric [...,3,3], ascending. Trigonometric method."""
    dtype = A.dtype
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p * p * p, 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eig1 >= eig2 >= eig3
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    lam = jnp.stack([e3, e2, e1], axis=-1)  # ascending
    # exact-diagonal / isotropic case: p ~ 0 -> all eigenvalues = q
    iso = p2 < 1e-28
    lam_iso = jnp.stack([q, q, q], axis=-1)
    return jnp.where(iso[..., None], lam_iso, lam)


def _eigvec_for(A, lam, fallback):
    """Eigenvector of symmetric 3x3 A for eigenvalue lam via cross products.

    rows of (A - lam I) span the orthogonal complement of the eigenspace;
    the largest cross product of two rows gives the eigenvector. ``fallback``
    is returned for degenerate (repeated-eigenvalue) cases.
    """
    dtype = A.dtype
    M = A - lam[..., None, None] * jnp.eye(3, dtype=dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.maximum(jnp.maximum(n01, n02), n12)
    ok = nbest > 1e-24
    v = best / jnp.sqrt(jnp.maximum(nbest, 1e-30))[..., None]
    return jnp.where(ok[..., None], v, fallback)


def eigh3(A):
    """Full symmetric 3x3 eigendecomposition: (eigvals ascending [...,3],
    eigvecs [...,3,3] with eigvecs[...,:,k] the k-th eigenvector)."""
    dtype = A.dtype
    lam = eigvalsh3(A)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), A.shape[:-1])
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype), A.shape[:-1])
    v0 = _eigvec_for(A, lam[..., 0], ex)
    v2 = _eigvec_for(A, lam[..., 2], ez)
    # make v2 orthogonal to v0 then complete the right-handed frame
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    v2n = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    v2 = jnp.where(v2n > 1e-12, v2 / jnp.maximum(v2n, 1e-30),
                   _any_orthogonal(v0))
    v1 = jnp.cross(v2, v0)
    return lam, jnp.stack([v0, v1, v2], axis=-1)


def _any_orthogonal(v):
    ref = jnp.where(
        jnp.abs(v[..., 0:1]) > 0.9,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], v.dtype), v.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape),
    )
    u = jnp.cross(v, ref)
    return u / jnp.linalg.norm(u, axis=-1, keepdims=True)


def smallest_eigvec3(A):
    """(lambda_min, unit eigenvector) of symmetric [...,3,3] — the plane-fit
    primitive (normal = eigenvector of smallest eigenvalue of covariance)."""
    lam = eigvalsh3(A)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), A.shape[:-1])
    v = _eigvec_for(A, lam[..., 0], ez)
    return lam, v
