"""SO(3) / SE(3) / S^2 manifold operations, batch-first and dtype-polymorphic.

TPU-native replacement for the GTSAM geometry layer used by the reference
(Pose3 with quaternions + expmap, Rot3, Unit3 gravity manifold, NavState —
see reference README.md:54 build flags and include/mimosa/state.hpp:22-50).

Conventions:
  * Quaternions are Hamilton, scalar-first ``[w, x, y, z]``, unit norm.
  * ``exp``/``log`` use the right tangent convention: ``R(phi) = R0 @ Exp(phi)``
    is composition on the right; standalone ``exp_so3(phi)`` maps an
    axis-angle vector in the body frame to a rotation.
  * All functions broadcast over leading batch dims and preserve input dtype.
  * Near-zero angles use Taylor expansions so everything is jit/grad safe.

S^2 (gravity direction) follows GTSAM's Unit3: a 2-dof tangent basis
``B(g) in R^{3x2}`` with retraction ``g' = Exp(B @ delta) g``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS2 = 1e-12  # squared-angle cutoff for Taylor branches


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (batched)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Rotation matrix -> quaternion (Shepperd's method, branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp / log / hat / Jacobians
# ---------------------------------------------------------------------------

def hat(v):
    """so(3) hat operator, batched: v in R^3 -> 3x3 skew matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def exp_so3(phi):
    """Axis-angle -> quaternion, Taylor-safe near zero."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-30)
    half = 0.5 * theta
    small = theta2 < _EPS2
    # sin(t/2)/t  and cos(t/2)
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def log_so3(q):
    """Quaternion -> axis-angle in (-pi, pi], Taylor-safe near identity."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # enforce w >= 0 for principal log
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    vn = jnp.sqrt(vn2 + 1e-30)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < _EPS2
    k = jnp.where(small, 2.0 / jnp.maximum(w, 0.5) , angle / vn)
    return k * q[..., 1:]


def exp_so3_mat(phi):
    """Axis-angle -> rotation matrix (Rodrigues), Taylor-safe."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(phi)
    small = theta2 < _EPS2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * K + b * (K @ K)


def left_jacobian_so3(phi):
    """SO(3) left Jacobian J_l(phi): Exp(phi+dphi) ≈ Exp(J_l dphi) Exp(phi)."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(phi)
    small = theta2 < _EPS2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + b * K + c * (K @ K)


def right_jacobian_so3(phi):
    """SO(3) right Jacobian J_r(phi) = J_l(-phi)."""
    return left_jacobian_so3(-phi)


def inv_right_jacobian_so3(phi):
    """Inverse right Jacobian, Taylor-safe."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(phi)
    small = theta2 < _EPS2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / theta2) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta) + 1e-30),
    )
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + 0.5 * K + cot_term * (K @ K)


# ---------------------------------------------------------------------------
# SE(3) as (quaternion, translation)
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return quat_identity(dtype), jnp.zeros(3, dtype=dtype)


def se3_compose(qa, ta, qb, tb):
    """T_a * T_b."""
    return quat_mul(qa, qb), ta + quat_rotate(qa, tb)


def se3_inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def se3_transform(q, t, p):
    """Apply T = (q, t) to point(s) p."""
    return quat_rotate(q, p) + t


def se3_retract(q, t, xi):
    """Right retraction with decoupled rot/trans tangent ``xi = [dR(3), dt(3)]``.

    q' = q ⊗ Exp(dR),  t' = t + R(q) dt.  This matches GTSAM's
    Pose3 expmap-less retract used when poses are optimized with
    separate rotation/translation blocks.
    """
    dq = exp_so3(xi[..., :3])
    return quat_mul(q, dq), t + quat_rotate(q, xi[..., 3:6])


def se3_local(qa, ta, qb, tb):
    """Inverse of se3_retract: tangent taking (qa,ta) to (qb,tb)."""
    dq = quat_mul(quat_conj(qa), qb)
    dr = log_so3(dq)
    dt = quat_rotate(quat_conj(qa), tb - ta)
    return jnp.concatenate([dr, dt], axis=-1)


def pose_tangent_adjoint(q_ab, t_ab):
    """Map a right-retraction tangent on T_W_A to the equivalent tangent on
    T_W_B where T_W_B = T_W_A @ T_AB: returns A [6,6] with
    xi_B = A @ xi_A (for the decoupled [dR, dt] retraction of se3_retract).

    A = [[R_ab^T, 0], [-R_ab^T [t_ab]x, R_ab^T]].
    Use: a factor linearized on the sensor pose (e.g. photometric on T_W_L)
    transfers to the body state via H_body = A^T H_sensor A, b_body = A^T b.
    """
    R = quat_to_mat(q_ab)
    Rt = jnp.swapaxes(R, -1, -2)
    A = jnp.zeros(q_ab.shape[:-1] + (6, 6), q_ab.dtype)
    A = A.at[..., :3, :3].set(Rt)
    A = A.at[..., 3:, 3:].set(Rt)
    A = A.at[..., 3:, :3].set(-Rt @ hat(t_ab))
    return A


# ---------------------------------------------------------------------------
# S^2 gravity-direction manifold (GTSAM Unit3 equivalent)
# ---------------------------------------------------------------------------

def s2_basis(g):
    """Orthonormal 2-dof tangent basis B(g) in R^{...,3,2} for unit vector g."""
    # pick the axis least aligned with g to build the first tangent
    ref = jnp.where(
        (jnp.abs(g[..., 0:1]) > 0.9),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=g.dtype), g.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=g.dtype), g.shape),
    )
    b1 = jnp.cross(g, ref)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(g, b1)
    return jnp.stack([b1, b2], axis=-1)


def s2_retract(g, delta):
    """g' = Exp(B(g) @ delta) g  (rotation of g about tangent directions)."""
    b = s2_basis(g)
    omega = jnp.cross(g, jnp.einsum("...ij,...j->...i", b, delta))
    q = exp_so3(omega)
    return quat_rotate(q, g)


def s2_local(ga, gb):
    """Tangent delta at ga pointing to gb (inverse of s2_retract, small angles)."""
    b = s2_basis(ga)
    axis = jnp.cross(ga, gb)
    sin_t = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_t = jnp.sum(ga * gb, axis=-1, keepdims=True)
    theta = jnp.arctan2(sin_t, cos_t)
    axis = axis / jnp.maximum(sin_t, 1e-12)
    omega = theta * axis
    # retract uses omega = g × (B d) with B d ⊥ g; invert via (g×x)×g = x:
    bd = jnp.cross(omega, ga)
    return jnp.einsum("...ij,...i->...j", b, bd)


# ---------------------------------------------------------------------------
# NavState pytree
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class NavState:
    """Pose + velocity value object (reference state.hpp:22-50 equivalent).

    Fields broadcast: q [...,4] body->world rotation, p [...,3] position in
    world, v [...,3] velocity in world.
    """

    def __init__(self, q, p, v):
        self.q, self.p, self.v = q, p, v

    def tree_flatten(self):
        return (self.q, self.p, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def identity(cls, dtype=jnp.float32):
        return cls(quat_identity(dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype))

    def retract(self, xi):
        """xi = [dR(3), dp(3), dv(3)] right-retraction."""
        q, p = se3_retract(self.q, self.p, xi[..., :6])
        return NavState(q, p, self.v + xi[..., 6:9])

    def __repr__(self):
        return f"NavState(q={self.q}, p={self.p}, v={self.v})"
