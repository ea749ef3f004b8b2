import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh

MAP_CFG = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=16,
                            plane_min_points=5, neighbor_voxel_mode=7)
CFG = geo.GeometricConfig(loc_count_thresh=30.0)


def make_room(seed=0, n_per=6000, noise=0.003):
    """Axis-aligned room: floor, ceiling, 2 walls -> full 6-dof constraint."""
    rng = np.random.default_rng(seed)
    clouds = []
    for axis, val in [(2, 0.0), (2, 3.0), (0, 0.0), (0, 4.0), (1, 0.0)]:
        p = rng.uniform(0.2, 3.8, size=(n_per, 3))
        p[:, axis] = val + rng.normal(size=n_per) * noise
        clouds.append(p)
    return np.concatenate(clouds)


def build_map(world_pts):
    m = vh.create(MAP_CFG, dtype=jnp.float64)
    pts = jnp.asarray(world_pts)
    m = vh.insert(m, pts, jnp.ones(len(world_pts), bool), 0, MAP_CFG)
    return vh.update_planes(m, MAP_CFG)


def sample_scan(world_pts, q_true, t_true, n=4000, seed=1):
    """Scan points in body frame of the true pose."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(world_pts), n, replace=False)
    pw = jnp.asarray(world_pts[idx])
    qi, ti = lie.se3_inverse(jnp.asarray(q_true), jnp.asarray(t_true))
    return lie.se3_transform(qi, ti, pw)


def test_jacobian_matches_numeric():
    world = make_room()
    m = build_map(world)
    q_true = lie.exp_so3(jnp.asarray([0.1, -0.2, 0.3]))
    t_true = jnp.asarray([1.5, 1.2, 1.0])
    pts_b = sample_scan(world, q_true, t_true, n=200)
    valid = jnp.ones(200, bool)

    # residual as a function of tangent, with correspondences FIXED at xi=0
    R = lie.quat_to_mat(q_true)
    p_w0 = pts_b @ R.T + t_true
    normal, mean, found = vh.query_planes(m, p_w0, MAP_CFG)

    def res(xi):
        q2, t2 = lie.se3_retract(q_true, t_true, xi)
        p_w = pts_b @ lie.quat_to_mat(q2).T + t2
        return jnp.sum(normal * (p_w - mean), axis=-1)

    J_auto = jax.jacfwd(res)(jnp.zeros(6))
    nR = normal @ R
    j_rot = jnp.cross(pts_b, nR)
    J_manual = jnp.concatenate([j_rot, nR], axis=-1)
    np.testing.assert_allclose(J_auto, J_manual, atol=1e-9)


def test_gn_converges_to_true_pose():
    world = make_room()
    m = build_map(world)
    q_true = lie.exp_so3(jnp.asarray([0.05, -0.1, 0.7]))
    t_true = jnp.asarray([2.0, 1.5, 1.2])
    pts_b = sample_scan(world, q_true, t_true, n=4000)
    valid = jnp.ones(pts_b.shape[0], bool)

    # start from a perturbed pose
    q = lie.quat_mul(q_true, lie.exp_so3(jnp.asarray([0.03, 0.02, -0.04])))
    t = t_true + jnp.asarray([0.15, -0.1, 0.08])
    for _ in range(6):
        res = geo.linearize(m, pts_b, valid, q, t, MAP_CFG, CFG)
        H = res.H + jnp.eye(6) * 1e-6
        dx = -jnp.linalg.solve(H, res.b)
        q, t = lie.se3_retract(q, t, dx)

    err_t = float(jnp.linalg.norm(t - t_true))
    err_r = float(jnp.linalg.norm(lie.log_so3(
        lie.quat_mul(lie.quat_conj(q_true), q))))
    assert err_t < 0.01, err_t
    assert err_r < 0.01, err_r
    assert int(res.num_inlier) > 3000
    # full 6-dof observable in a room
    assert not bool(jnp.any(res.degenerate_rot))
    assert not bool(jnp.any(res.degenerate_trans))


def test_status_counters():
    world = make_room()
    m = build_map(world)
    q = lie.quat_identity(jnp.float64)
    t = jnp.asarray([2.0, 1.5, 1.2])
    pts_b = sample_scan(world, q, t, n=1000)
    # half the points far outside the map -> NO_PLANE
    far = jnp.asarray(np.random.default_rng(3).uniform(50, 60, size=(1000, 3)))
    pts = jnp.concatenate([pts_b, far])
    valid = jnp.ones(2000, bool)
    res = geo.linearize(m, pts, valid, q, t, MAP_CFG, CFG)
    counts = np.asarray(res.status_counts)
    assert counts[geo.STATUS_NO_PLANE] >= 1000
    assert counts.sum() == 2000
    assert counts[geo.STATUS_INLIER] > 900


def test_corridor_degeneracy_detected():
    """Two parallel walls + floor only: translation along the corridor (x)
    is unobservable -> flagged degenerate."""
    rng = np.random.default_rng(5)
    clouds = []
    for axis, val in [(1, 0.0), (1, 2.0), (2, 0.0)]:
        p = rng.uniform(0, 20, size=(8000, 3))
        p[:, 1] = np.clip(p[:, 1], 0, 2.0)
        p[:, 2] = np.clip(p[:, 2], 0, 2.5)
        p[:, axis] = val + rng.normal(size=8000) * 0.003
        clouds.append(p)
    world = np.concatenate(clouds)
    m = build_map(world)
    q = lie.quat_identity(jnp.float64)
    t = jnp.asarray([10.0, 1.0, 1.2])
    pts_b = sample_scan(world, q, t, n=4000, seed=6)
    res = geo.linearize(m, pts_b, jnp.ones(4000, bool), q, t, MAP_CFG, CFG)
    # weakest translation direction should be x (corridor axis)
    vweak = np.asarray(res.eigvecs_trans[:, 0])
    assert abs(vweak[0]) > 0.95
    assert bool(res.degenerate_trans[0]) or (
        float(res.eigvals_trans[0]) < 0.05 * float(res.eigvals_trans[2]))


def test_4dof_projection_kills_roll_pitch():
    world = make_room()
    m = build_map(world)
    q = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.3]))
    t = jnp.asarray([2.0, 1.5, 1.2])
    pts_b = sample_scan(world, q, t, n=2000, seed=7)
    g_dir = jnp.asarray([0.0, 0.0, -1.0])
    cfg4 = geo.GeometricConfig(use_4dof=True, loc_count_thresh=30.0)
    res = geo.linearize(m, pts_b, jnp.ones(2000, bool), q, t, MAP_CFG, cfg4,
                        g_dir=g_dir)
    # rotation block must have rank 1 (yaw only)
    lam = np.linalg.eigvalsh(np.asarray(res.H[:3, :3]))
    assert lam[1] < 1e-6 * max(lam[2], 1.0)
    # yaw axis in body frame = R^T g (up to sign)
    Rt_g = np.asarray(lie.quat_to_mat(q).T @ g_dir)
    v = np.asarray(res.H[:3, :3] @ Rt_g)
    assert np.linalg.norm(v) > 0  # yaw direction preserved


def test_degeneracy_projector():
    world = make_room()
    m = build_map(world)
    q = lie.quat_identity(jnp.float64)
    t = jnp.asarray([2.0, 1.5, 1.2])
    pts_b = sample_scan(world, q, t, n=1000, seed=8)
    res = geo.linearize(m, pts_b, jnp.ones(1000, bool), q, t, MAP_CFG, CFG)
    P = geo.degeneracy_projector(res)
    # no degeneracy in a room -> P == identity
    np.testing.assert_allclose(P, np.eye(6), atol=1e-6)
