"""Binary (two-key, scan-to-scan) factor variants — the reference API's
second ICPFactor / PhotometricFactor constructors
(geometric_factor.hpp:131-141, photometric_factor.hpp:81-99). The
reference runtime never builds them, but they are part of the factor
surface; these tests pin (a) exact equality with the unary factor at an
identity target/anchor, (b) the analytic two-key Jacobian against
autodiff, and (c) the relative-measurement gauge: a common rigid motion
of both states lies in the Hessian's null space."""

import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.lidar import photometric as ph
from mimosa_tpu.mapping import voxel_hash as vh

MAP_CFG = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                            plane_min_points=5, neighbor_voxel_mode=7)
CFG = geo.GeometricConfig(loc_count_thresh=30.0)


def make_room(seed=0, n_per=5000, noise=0.003):
    rng = np.random.default_rng(seed)
    clouds = []
    for axis, val in [(2, 0.0), (2, 3.0), (0, 0.0), (0, 4.0), (1, 0.0)]:
        p = rng.uniform(0.2, 3.8, size=(n_per, 3))
        p[:, axis] = val + rng.normal(size=n_per) * noise
        clouds.append(p)
    return np.concatenate(clouds)


def build_map(world_pts, frame_q=None, frame_t=None):
    """Voxel map of the room expressed in an arbitrary 'target' frame."""
    pts = jnp.asarray(world_pts)
    if frame_q is not None:
        qi, ti = lie.se3_inverse(frame_q, frame_t)
        pts = lie.se3_transform(qi, ti, pts)
    m = vh.create(MAP_CFG, dtype=jnp.float64)
    m = vh.insert(m, pts, jnp.ones(len(world_pts), bool), 0, MAP_CFG)
    return vh.update_planes(m, MAP_CFG)


def sample_scan(world_pts, q_true, t_true, n=3000, seed=1):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(world_pts), n, replace=False)
    pw = jnp.asarray(world_pts[idx])
    qi, ti = lie.se3_inverse(jnp.asarray(q_true), jnp.asarray(t_true))
    return lie.se3_transform(qi, ti, pw)


def _poses():
    q_s = lie.exp_so3(jnp.asarray([0.05, -0.1, 0.3]))
    t_s = jnp.asarray([1.5, 1.2, 1.0])
    q_t = lie.exp_so3(jnp.asarray([-0.2, 0.06, -0.5]))
    t_t = jnp.asarray([0.6, 2.0, 1.4])
    return q_s, t_s, q_t, t_t


def test_binary_icp_identity_target_matches_unary():
    world = make_room()
    m = build_map(world)
    q_s, t_s, _, _ = _poses()
    pts = sample_scan(world, q_s, t_s)
    valid = jnp.ones(len(pts), bool)
    qi = lie.quat_identity(jnp.float64)
    z = jnp.zeros(3, jnp.float64)

    una = geo.linearize(m, pts, valid, q_s, t_s, MAP_CFG, CFG)
    bi = geo.linearize_binary(m, pts, valid, q_s, t_s, qi, z, MAP_CFG, CFG)
    np.testing.assert_allclose(bi.H[:6, :6], una.H, rtol=1e-9)
    np.testing.assert_allclose(bi.b[:6], una.b, rtol=1e-9)
    assert int(bi.num_inlier) == int(una.num_inlier) > 2000


def test_binary_icp_jacobian_matches_autodiff():
    """H and b must equal J^T W J / J^T W r with J from autodiff of the
    residual at fixed correspondences and fixed weights."""
    world = make_room()
    q_s, t_s, q_t, t_t = _poses()
    m = build_map(world, q_t, t_t)
    pts = sample_scan(world, q_s, t_s)
    valid = jnp.ones(len(pts), bool)

    bi = geo.linearize_binary(m, pts, valid, q_s, t_s, q_t, t_t,
                              MAP_CFG, CFG)
    assert int(bi.num_inlier) > 2000

    # recompute matches + weights exactly as the factor does
    qi, ti = lie.se3_inverse(q_t, t_t)
    q_d, t_d = lie.se3_compose(qi, ti, q_s, t_s)
    y0 = lie.se3_transform(q_d, t_d, pts)
    normal, mean, found = vh.query_planes(m, y0, MAP_CFG)
    r0 = jnp.sum(normal * (y0 - mean), axis=-1)
    in_dist = jnp.abs(r0) <= CFG.max_p2p_dist
    pn = jnp.sqrt(jnp.linalg.norm(pts, axis=-1) + 1e-12)
    in_s = (1.0 - 0.9 * jnp.abs(r0) / pn) >= CFG.s_gate_min
    inlier = valid & found & in_dist & in_s
    ar = jnp.abs(r0)
    w_h = jnp.where(ar <= CFG.huber_delta, 1.0,
                    CFG.huber_delta / jnp.maximum(ar, 1e-12))
    w = jnp.where(inlier, w_h, 0.0) / (CFG.sigma ** 2)

    def r_vec(xi):
        qs2, ts2 = lie.se3_retract(q_s, t_s, xi[:6])
        qt2, tt2 = lie.se3_retract(q_t, t_t, xi[6:])
        qi2, ti2 = lie.se3_inverse(qt2, tt2)
        qd2, td2 = lie.se3_compose(qi2, ti2, qs2, ts2)
        y = lie.se3_transform(qd2, td2, pts)
        return jnp.sum(normal * (y - mean), axis=-1)

    J = jax.jacfwd(r_vec)(jnp.zeros(12, jnp.float64))
    H_ref = jnp.einsum("ni,nj,n->ij", J, J, w)
    b_ref = jnp.einsum("ni,n->i", J, w * r0)
    np.testing.assert_allclose(np.asarray(bi.H), np.asarray(H_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(bi.b), np.asarray(b_ref),
                               rtol=1e-6, atol=1e-8)


def _gauge_vectors(q_s, t_s, q_t, t_t, dtype=jnp.float64):
    """Right-tangent 12-vectors of a common world translation / rotation
    applied to both states (null directions of any relative factor)."""
    Rs = lie.quat_to_mat(q_s)
    Rt = lie.quat_to_mat(q_t)
    vs = []
    for d in np.eye(3):
        d = jnp.asarray(d, dtype)
        vs.append(jnp.concatenate([jnp.zeros(3, dtype), Rs.T @ d,
                                   jnp.zeros(3, dtype), Rt.T @ d]))
    for w in np.eye(3):
        w = jnp.asarray(w, dtype)
        vs.append(jnp.concatenate([
            Rs.T @ w, Rs.T @ jnp.cross(w, t_s),
            Rt.T @ w, Rt.T @ jnp.cross(w, t_t)]))
    return vs


def test_binary_icp_gauge_null_space():
    world = make_room()
    q_s, t_s, q_t, t_t = _poses()
    m = build_map(world, q_t, t_t)
    pts = sample_scan(world, q_s, t_s)
    bi = geo.linearize_binary(m, pts, jnp.ones(len(pts), bool),
                              q_s, t_s, q_t, t_t, MAP_CFG, CFG)
    H = np.asarray(bi.H)
    scale = np.linalg.norm(H)
    for v in _gauge_vectors(q_s, t_s, q_t, t_t):
        assert np.linalg.norm(H @ np.asarray(v)) < 1e-6 * scale


PCFG = ph.PhotometricConfig(rows=32, cols=256, range_min=0.5,
                            range_max=50.0, gradient_threshold=2.0,
                            nma_radius=3, num_features=40, margin=4,
                            filter_brightness=False, remove_lines=False,
                            gaussian_blur=False, intensity_scale=1.0)


def _textured_scene(seed=0, n=120000):
    rng = np.random.default_rng(seed)
    pts = []
    for axis, val in [(0, 6.0), (1, 5.0), (0, -6.0), (1, -5.0)]:
        p = rng.uniform(-7, 7, size=(n // 4, 3))
        p[:, 2] = rng.uniform(-2.5, 2.5, size=n // 4)
        p[:, axis] = val
        pts.append(p)
    pts = np.concatenate(pts)
    inten = (120 + 60 * np.sin(2.0 * pts[:, 0]) * np.cos(1.5 * pts[:, 1])
             + 40 * np.sin(3.0 * pts[:, 2]))
    return jnp.asarray(pts, jnp.float32), \
        jnp.asarray(np.clip(inten, 0, 255), jnp.float32)


def test_binary_photo_identity_anchor_matches_unary():
    pts, inten = _textured_scene(5)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), PCFG)
    feats = ph.empty_features(PCFG)
    qI = lie.quat_identity(jnp.float32)
    z = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, feats, qI, z, PCFG)
    assert int(jnp.sum(feats.valid)) > 10

    # pose b slightly off identity so the factor is non-trivial
    q_b = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.005], jnp.float32))
    t_b = jnp.asarray([0.01, -0.02, 0.0], jnp.float32)
    una = ph.linearize(frame, feats, q_b, t_b, PCFG)
    # anchor a at identity with the same (world-frame) patch points:
    # p_lb = T_b^-1 (I . p) == the unary projection
    bi = ph.linearize_binary(frame, feats.pts_w, feats.psi, feats.valid,
                             qI, z, q_b, t_b, PCFG)
    assert int(bi.num_tracked) == int(una.num_tracked) > 10
    np.testing.assert_allclose(np.asarray(bi.H[6:, 6:]),
                               np.asarray(una.H), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bi.b[6:]), np.asarray(una.b),
                               rtol=2e-4, atol=1e-7)


def test_binary_photo_gauge_null_space():
    pts, inten = _textured_scene(7)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), PCFG)
    feats = ph.empty_features(PCFG)
    qI = lie.quat_identity(jnp.float32)
    z = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, feats, qI, z, PCFG)

    q_a = lie.exp_so3(jnp.asarray([0.01, 0.02, -0.01], jnp.float32))
    t_a = jnp.asarray([0.1, 0.05, -0.02], jnp.float32)
    # patch points in a's lidar frame
    qi, ti = lie.se3_inverse(q_a, t_a)
    pts_a = jax.vmap(lambda p: lie.se3_transform(qi, ti, p))(feats.pts_w)
    q_b = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.004], jnp.float32))
    t_b = jnp.asarray([0.01, 0.0, 0.01], jnp.float32)

    bi = ph.linearize_binary(frame, pts_a, feats.psi, feats.valid,
                             q_a, t_a, q_b, t_b, PCFG)
    assert int(bi.num_tracked) > 10
    H = np.asarray(bi.H, np.float64)
    scale = np.linalg.norm(H)
    for v in _gauge_vectors(q_a, t_a, q_b, t_b, dtype=jnp.float32):
        assert np.linalg.norm(H @ np.asarray(v, np.float64)) < 1e-4 * scale
