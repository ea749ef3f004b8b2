import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie


def rng_vecs(seed, n, scale=1.0, dim=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    if dim == 3 and scale > 1.0:
        # keep rotation-ish vectors inside the principal ball |phi| < pi
        v = v / np.linalg.norm(v, axis=-1, keepdims=True) * rng.uniform(
            0.0, 3.1, size=(n, 1)
        )
        return jnp.asarray(v)
    return jnp.asarray(v * scale)


def test_exp_log_roundtrip():
    phi = rng_vecs(0, 64, scale=1.5)
    q = lie.exp_so3(phi)
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-9)
    phi2 = lie.log_so3(q)
    np.testing.assert_allclose(phi, phi2, atol=1e-8)


def test_exp_log_small_angles():
    phi = rng_vecs(1, 32, scale=1e-8)
    np.testing.assert_allclose(lie.log_so3(lie.exp_so3(phi)), phi, atol=1e-12)
    # exactly zero
    z = jnp.zeros((3,))
    np.testing.assert_allclose(lie.log_so3(lie.exp_so3(z)), z, atol=0)


def test_quat_rotate_matches_matrix():
    phi = rng_vecs(2, 16, scale=2.0)
    v = rng_vecs(3, 16, scale=3.0)
    q = lie.exp_so3(phi)
    R = lie.quat_to_mat(q)
    np.testing.assert_allclose(
        lie.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-9
    )
    # Rodrigues matrix agrees with quaternion matrix
    np.testing.assert_allclose(lie.exp_so3_mat(phi), R, atol=1e-9)


def test_mat_to_quat_roundtrip():
    phi = rng_vecs(4, 64, scale=3.0)
    q = lie.exp_so3(phi)
    R = lie.quat_to_mat(q)
    q2 = lie.mat_to_quat(R)
    # sign ambiguity
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-8)


def test_quat_mul_associative_with_rotation():
    qa = lie.exp_so3(rng_vecs(5, 8))
    qb = lie.exp_so3(rng_vecs(6, 8))
    v = rng_vecs(7, 8)
    lhs = lie.quat_rotate(lie.quat_mul(qa, qb), v)
    rhs = lie.quat_rotate(qa, lie.quat_rotate(qb, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_right_jacobian_numeric():
    rng = np.random.default_rng(8)
    phi = jnp.asarray(rng.normal(size=3))
    Jr = lie.right_jacobian_so3(phi)
    eps = 1e-6
    cols = []
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        qp = lie.exp_so3(phi + jnp.asarray(d))
        qm = lie.exp_so3(phi - jnp.asarray(d))
        # Exp(phi+d) = Exp(phi) Exp(Jr d) => Jr d = Log(Exp(phi)^-1 Exp(phi+d))
        dp = lie.log_so3(lie.quat_mul(lie.quat_conj(lie.exp_so3(phi)), qp))
        dm = lie.log_so3(lie.quat_mul(lie.quat_conj(lie.exp_so3(phi)), qm))
        cols.append((dp - dm) / (2 * eps))
    Jr_num = jnp.stack(cols, axis=-1)
    np.testing.assert_allclose(Jr, Jr_num, atol=1e-6)


def test_inv_right_jacobian():
    phi = rng_vecs(9, 16, scale=1.0)
    Jr = lie.right_jacobian_so3(phi)
    Jri = lie.inv_right_jacobian_so3(phi)
    eye = jnp.broadcast_to(jnp.eye(3), Jr.shape)
    np.testing.assert_allclose(Jr @ Jri, eye, atol=1e-7)


def test_se3_compose_inverse():
    qa, ta = lie.exp_so3(rng_vecs(10, 8)), rng_vecs(11, 8)
    qi, ti = lie.se3_inverse(qa, ta)
    qc, tc = lie.se3_compose(qa, ta, qi, ti)
    np.testing.assert_allclose(jnp.abs(qc[..., 0]), 1.0, atol=1e-9)
    np.testing.assert_allclose(tc, 0.0, atol=1e-9)


def test_se3_retract_local_roundtrip():
    qa, ta = lie.exp_so3(rng_vecs(12, 8)), rng_vecs(13, 8)
    xi = rng_vecs(14, 8, scale=0.5, dim=6)
    qb, tb = lie.se3_retract(qa, ta, xi)
    xi2 = lie.se3_local(qa, ta, qb, tb)
    np.testing.assert_allclose(xi, xi2, atol=1e-8)


def test_se3_transform():
    qa, ta = lie.exp_so3(rng_vecs(15, 8)), rng_vecs(16, 8)
    p = rng_vecs(17, 8)
    out = lie.se3_transform(qa, ta, p)
    np.testing.assert_allclose(out, lie.quat_rotate(qa, p) + ta, atol=1e-12)


def test_s2_retract_stays_unit():
    g = jnp.asarray([0.0, 0.0, -1.0])
    d = jnp.asarray([0.3, -0.2])
    g2 = lie.s2_retract(g, d)
    np.testing.assert_allclose(jnp.linalg.norm(g2), 1.0, atol=1e-9)


def test_s2_local_roundtrip():
    rng = np.random.default_rng(18)
    for _ in range(10):
        g = rng.normal(size=3)
        g = jnp.asarray(g / np.linalg.norm(g))
        d = jnp.asarray(rng.normal(size=2) * 0.5)
        g2 = lie.s2_retract(g, d)
        d2 = lie.s2_local(g, g2)
        np.testing.assert_allclose(d, d2, atol=1e-8)


def test_s2_basis_orthonormal():
    g = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [1.0, 1.0, -1.0]])
    g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    B = lie.s2_basis(g)
    # columns unit and orthogonal to g and each other
    np.testing.assert_allclose(jnp.einsum("nij,nik->njk", B, B),
                               jnp.broadcast_to(jnp.eye(2), (3, 2, 2)), atol=1e-7)
    np.testing.assert_allclose(jnp.einsum("nij,ni->nj", B, g), 0.0, atol=1e-7)


def test_navstate_retract():
    s = lie.NavState.identity(jnp.float64)
    xi = jnp.asarray([0.1, 0.0, 0.0, 1.0, 2.0, 3.0, 0.5, 0.0, 0.0])
    s2 = s.retract(xi)
    np.testing.assert_allclose(s2.p, [1.0, 2.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(s2.v, [0.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(lie.log_so3(s2.q), [0.1, 0.0, 0.0], atol=1e-12)


def test_f32_paths_jit():
    """Production dtype smoke test under jit."""
    phi = jnp.asarray(np.random.default_rng(19).normal(size=(8, 3)), jnp.float32)
    f = jax.jit(lambda p: lie.log_so3(lie.exp_so3(p)))
    out = f(phi)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(out, phi, atol=1e-5)
