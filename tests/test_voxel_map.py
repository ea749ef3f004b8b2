import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.lidar.downsample import voxel_downsample
from mimosa_tpu.mapping import voxel_hash as vh

CFG = vh.VoxelMapConfig(leaf_size=0.5, capacity_log2=14, plane_min_points=5,
                        neighbor_voxel_mode=7, lru_horizon=10)


def plane_points(seed, n, normal, offset, extent=5.0, noise=0.0):
    rng = np.random.default_rng(seed)
    normal = np.asarray(normal, float)
    normal /= np.linalg.norm(normal)
    b1 = np.cross(normal, [0.0, 0.3, 1.0])
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(normal, b1)
    uv = rng.uniform(-extent, extent, size=(n, 2))
    pts = uv @ np.stack([b1, b2]) + offset * normal
    pts += rng.normal(size=(n, 1)) * noise * normal
    return jnp.asarray(pts)


def test_insert_and_count():
    m = vh.create(CFG)
    pts = plane_points(0, 2000, [0, 0, 1.0], 0.0)
    m = vh.insert(m, pts, jnp.ones(2000, bool), 0, CFG)
    occ = int(m.num_occupied)
    assert occ > 50
    # total accumulated points <= inserted (saturation may drop some)
    assert float(jnp.sum(m.n[:-1])) <= 2000
    assert float(jnp.sum(m.n[:-1])) > 1500


def test_same_voxel_lanes_merge():
    m = vh.create(CFG)
    # 100 copies of the same point -> one voxel, saturating count
    pts = jnp.tile(jnp.asarray([[0.1, 0.1, 0.1]]), (100, 1))
    m = vh.insert(m, pts, jnp.ones(100, bool), 0, CFG)
    assert int(m.num_occupied) == 1
    assert float(jnp.max(m.n[:-1])) <= CFG.max_points_per_voxel + 1


def test_invalid_lanes_ignored():
    m = vh.create(CFG)
    pts = plane_points(1, 100, [0, 0, 1.0], 0.0)
    m2 = vh.insert(m, pts, jnp.zeros(100, bool), 0, CFG)
    assert int(m2.num_occupied) == 0
    np.testing.assert_allclose(m2.n, m.n)


def test_plane_fit_and_query():
    m = vh.create(CFG)
    pts = plane_points(2, 5000, [0, 0, 1.0], 2.0, noise=0.005)
    m = vh.insert(m, pts, jnp.ones(5000, bool), 0, CFG)
    m = vh.update_planes(m, CFG)
    assert int(jnp.sum(m.plane_valid)) > 20
    q = jnp.asarray([[1.0, 1.0, 2.02], [-2.0, 0.5, 1.97]])
    normal, mean, found = vh.query_planes(m, q, CFG)
    assert bool(found[0]) and bool(found[1])
    for k in range(2):
        assert abs(float(jnp.abs(normal[k, 2]))) > 0.99
        # point-to-plane distance small
        d = float(jnp.abs(jnp.sum(normal[k] * (q[k] - mean[k]))))
        assert d < 0.05


def test_query_stencil_fallback():
    """Query point in an empty voxel adjacent to an occupied one."""
    m = vh.create(CFG)
    pts = plane_points(3, 3000, [0, 0, 1.0], 0.0, extent=2.0, noise=0.002)
    m = vh.insert(m, pts, jnp.ones(3000, bool), 0, CFG)
    m = vh.update_planes(m, CFG)
    # query slightly above the plane, in the voxel above
    q = jnp.asarray([[0.3, 0.3, 0.6]])
    _, _, found = vh.query_planes(m, q, CFG)
    assert bool(found[0])


def test_lru_eviction():
    m = vh.create(CFG)
    pts = plane_points(4, 500, [0, 0, 1.0], 0.0)
    m = vh.insert(m, pts, jnp.ones(500, bool), 0, CFG)
    occ0 = int(m.num_occupied)
    m = vh.evict_stale(m, 5, CFG)
    assert int(m.num_occupied) == occ0  # within horizon
    m = vh.evict_stale(m, 50, CFG)
    assert int(m.num_occupied) == 0
    # slots are reusable after eviction
    m = vh.insert(m, pts, jnp.ones(500, bool), 50, CFG)
    assert int(m.num_occupied) == occ0


def test_insert_is_jittable_and_incremental():
    cfg = CFG
    ins = jax.jit(lambda m, p, v, i: vh.insert(m, p, v, i, cfg))
    m = vh.create(cfg)
    p1 = plane_points(5, 2000, [0, 1.0, 0], 1.0, extent=2.0, noise=0.002)
    p2 = plane_points(6, 2000, [1.0, 0, 0], -1.0, extent=2.0, noise=0.002)
    m = ins(m, p1, jnp.ones(2000, bool), 0)
    m = ins(m, p2, jnp.ones(2000, bool), 1)
    m = vh.update_planes(m, cfg)
    qn, _, f1 = vh.query_planes(m, jnp.asarray([[0.2, 1.0, 0.3]]), cfg)
    assert bool(f1[0]) and abs(float(qn[0, 1])) > 0.95
    qn2, _, f2 = vh.query_planes(m, jnp.asarray([[-1.0, 0.1, 0.2]]), cfg)
    assert bool(f2[0]) and abs(float(qn2[0, 0])) > 0.95


def test_voxel_downsample():
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-4, 4, size=(5000, 3)))
    valid = jnp.ones(5000, bool)
    out, ov, sel = voxel_downsample(pts, valid, 1.0, 2048)
    k = int(jnp.sum(ov))
    # roughly one point per occupied voxel of an 8^3 grid
    assert 200 < k < 1000
    # all selected points come from distinct voxels
    vc = np.asarray(vh.voxel_coords(out[:k], 1.0))
    assert len(np.unique(vc, axis=0)) == k
    # padding invalid lanes never selected
    out2, ov2, _ = voxel_downsample(pts, valid.at[100:].set(False), 1.0, 256)
    assert int(jnp.sum(ov2)) <= 100


def test_update_planes_at_matches_full():
    """Incremental plane refit of only the inserted slots must produce the
    same map state as a full-capacity sweep (the per-scan path refits only
    touched voxels — an O(capacity) eigendecomposition sweep per scan
    dominated the device program)."""
    m = vh.create(CFG)
    a = plane_points(0, 3000, [0, 0, 1.0], 0.0, noise=0.01)
    m = vh.insert(m, a, jnp.ones(3000, bool), 0, CFG)
    m = vh.update_planes(m, CFG)

    b = plane_points(1, 2000, [1.0, 0, 0], 2.0, noise=0.01)
    m2, slots = vh.insert(m, b, jnp.ones(2000, bool), 1, CFG,
                          return_slots=True)
    m2 = vh.evict_stale(m2, 1, CFG)
    inc = vh.update_planes_at(m2, slots, CFG)
    full = vh.update_planes(vh.evict_stale(m2, 1, CFG), CFG)
    np.testing.assert_array_equal(np.asarray(inc.plane_valid),
                                  np.asarray(full.plane_valid))
    pv = np.asarray(full.plane_valid)
    np.testing.assert_allclose(np.asarray(inc.mean)[pv],
                               np.asarray(full.mean)[pv], atol=1e-6)
    dot = np.abs(np.sum(np.asarray(inc.normal)[pv]
                        * np.asarray(full.normal)[pv], axis=-1))
    assert (dot > 1 - 1e-5).all()
