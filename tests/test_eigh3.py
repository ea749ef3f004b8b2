import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core.eigh3 import eigh3, eigvalsh3, smallest_eigvec3


def random_sym(seed, n, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, 3, 3)) * scale
    return jnp.asarray(A + np.swapaxes(A, -1, -2))


def test_eigvals_match_numpy():
    A = random_sym(0, 256)
    lam = eigvalsh3(A)
    lam_np = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(lam, lam_np, atol=1e-8)


def test_eigvecs_satisfy_definition():
    A = random_sym(1, 128)
    lam, V = eigh3(A)
    for k in range(3):
        Av = jnp.einsum("nij,nj->ni", A, V[..., k])
        lv = lam[..., k : k + 1] * V[..., k]
        np.testing.assert_allclose(Av, lv, atol=1e-6)
    # orthonormality
    VtV = jnp.einsum("nki,nkj->nij", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=1e-7)


def test_isotropic_and_diagonal():
    A = jnp.stack([jnp.eye(3) * 2.5, jnp.diag(jnp.asarray([1.0, 2.0, 3.0])),
                   jnp.zeros((3, 3))])
    lam = eigvalsh3(A)
    np.testing.assert_allclose(lam[0], [2.5, 2.5, 2.5], atol=1e-9)
    np.testing.assert_allclose(lam[1], [1.0, 2.0, 3.0], atol=1e-9)
    np.testing.assert_allclose(lam[2], [0.0, 0.0, 0.0], atol=1e-9)


def test_plane_normal_from_covariance():
    """Points on a known plane -> smallest eigvec == plane normal."""
    rng = np.random.default_rng(2)
    n_true = np.array([1.0, 2.0, -0.5])
    n_true /= np.linalg.norm(n_true)
    # basis of the plane
    b1 = np.cross(n_true, [0, 0, 1.0]); b1 /= np.linalg.norm(b1)
    b2 = np.cross(n_true, b1)
    pts = rng.normal(size=(500, 2)) @ np.stack([b1, b2]) + 0.001 * rng.normal(
        size=(500, 1)) * n_true
    cov = jnp.asarray(np.cov(pts.T))
    lam, v = smallest_eigvec3(cov[None])
    assert abs(float(jnp.abs(jnp.sum(v[0] * jnp.asarray(n_true))))) > 0.9999
    assert float(lam[0, 0]) < 1e-5


def test_f32_accuracy():
    A = random_sym(3, 64).astype(jnp.float32)
    lam = eigvalsh3(A)
    lam_np = np.linalg.eigvalsh(np.asarray(A, np.float64))
    np.testing.assert_allclose(lam, lam_np, atol=1e-4)
