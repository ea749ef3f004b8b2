"""Mesh-sharded ICP vs single-device equivalence on the 8-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh
from mimosa_tpu.parallel import sharded as par

MAP_CFG = vh.VoxelMapConfig(leaf_size=0.4, capacity_log2=14,
                            plane_min_points=5)
GEO_CFG = geo.GeometricConfig(loc_count_thresh=30.0)


def room_points(seed=0, n_per=4000):
    rng = np.random.default_rng(seed)
    clouds = []
    for axis, val in [(2, 0.0), (2, 3.0), (0, 0.0), (0, 4.0), (1, 0.0)]:
        p = rng.uniform(0.2, 3.8, size=(n_per, 3))
        p[:, axis] = val + rng.normal(size=n_per) * 0.003
        clouds.append(p)
    return np.concatenate(clouds).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    world = room_points()
    q_true = lie.exp_so3(jnp.asarray([0.03, -0.05, 0.4], jnp.float32))
    t_true = jnp.asarray([2.0, 1.5, 1.2], jnp.float32)
    rng = np.random.default_rng(1)
    idx = rng.choice(len(world), 4096, replace=False)
    pw = jnp.asarray(world[idx])
    qi, ti = lie.se3_inverse(q_true, t_true)
    pts_b = lie.se3_transform(qi, ti, pw).astype(jnp.float32)
    return world, pts_b, q_true, t_true


def test_sharded_matches_single_device(setup):
    world, pts_b, q, t = setup
    valid = jnp.ones(pts_b.shape[0], bool)
    wpts = jnp.asarray(world)
    wvalid = jnp.ones(len(world), bool)

    # single device
    m1 = vh.create(MAP_CFG)
    m1 = vh.insert(m1, wpts, wvalid, 0, MAP_CFG)
    m1 = vh.update_planes(m1, MAP_CFG)
    r1 = geo.linearize(m1, pts_b, valid, q, t, MAP_CFG, GEO_CFG)

    # 4x2 mesh
    mesh = par.make_mesh(8, n_mp=2)
    ms = par.create_sharded_map(MAP_CFG, mesh)
    ms = par.sharded_insert(ms, wpts, wvalid, jnp.asarray(0, jnp.int32),
                            MAP_CFG, mesh)
    r2 = par.sharded_linearize(ms, pts_b, valid, q, t,
                               jnp.asarray([0, 0, -1.0], jnp.float32),
                               MAP_CFG, GEO_CFG, mesh)

    # same voxel contents (disjoint hash ownership), so planes & H agree
    # up to rare hash-collision differences
    assert abs(int(r1.num_inlier) - int(r2.num_inlier)) < \
        0.02 * int(r1.num_inlier)
    np.testing.assert_allclose(np.asarray(r2.H), np.asarray(r1.H),
                               rtol=0.05, atol=1e-2 * float(jnp.max(jnp.abs(r1.H))))
    assert not bool(jnp.any(r2.degenerate_trans))


def test_sharded_gn_converges(setup):
    world, pts_b, q_true, t_true = setup
    valid = jnp.ones(pts_b.shape[0], bool)
    mesh = par.make_mesh(8, n_mp=2)
    ms = par.create_sharded_map(MAP_CFG, mesh)
    ms = par.sharded_insert(ms, jnp.asarray(world),
                            jnp.ones(len(world), bool),
                            jnp.asarray(0, jnp.int32), MAP_CFG, mesh)
    q = lie.quat_mul(q_true, lie.exp_so3(
        jnp.asarray([0.02, -0.01, 0.03], jnp.float32)))
    t = t_true + jnp.asarray([0.1, -0.05, 0.08], jnp.float32)
    g = jnp.asarray([0, 0, -1.0], jnp.float32)
    for _ in range(5):
        res = par.sharded_linearize(ms, pts_b, valid, q, t, g,
                                    MAP_CFG, GEO_CFG, mesh)
        dx = -jnp.linalg.solve(res.H + jnp.eye(6) * 1e-4, res.b)
        q, t = lie.se3_retract(q, t, dx)
    assert float(jnp.linalg.norm(t - t_true)) < 0.02
    err_r = float(jnp.linalg.norm(lie.log_so3(
        lie.quat_mul(lie.quat_conj(q_true), q))))
    assert err_r < 0.02


def test_mp1_exactly_matches_single(setup):
    """With mp=1 the sharded path must be bit-identical to single device
    modulo dp reduction order."""
    world, pts_b, q, t = setup
    valid = jnp.ones(pts_b.shape[0], bool)
    m1 = vh.create(MAP_CFG)
    m1 = vh.insert(m1, jnp.asarray(world), jnp.ones(len(world), bool), 0,
                   MAP_CFG)
    m1 = vh.update_planes(m1, MAP_CFG)
    r1 = geo.linearize(m1, pts_b, valid, q, t, MAP_CFG, GEO_CFG)

    mesh = par.make_mesh(8, n_mp=1)
    ms = jax.tree_util.tree_map(lambda a: a[None], m1)
    r2 = par.sharded_linearize(ms, pts_b, valid, q, t,
                               jnp.asarray([0, 0, -1.0], jnp.float32),
                               MAP_CFG, GEO_CFG, mesh)
    assert int(r1.num_inlier) == int(r2.num_inlier)
    np.testing.assert_allclose(np.asarray(r2.H), np.asarray(r1.H), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r2.b), np.asarray(r1.b), rtol=1e-3,
                               atol=1e-3)
