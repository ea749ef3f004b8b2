"""Pallas fused ICP kernel vs the XLA reference implementation
(interpret mode on CPU; compiled-path parity is exercised on TPU via
scripts/bench_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


@pytest.fixture(scope="module")
def scene():
    from test_icp import MAP_CFG, build_map, make_room, sample_scan

    world = make_room()
    m = build_map(world)
    q = lie.exp_so3(jnp.asarray([0.05, -0.1, 0.4], jnp.float32))
    t = jnp.asarray([2.0, 1.5, 1.2], jnp.float32)
    pts = sample_scan(world, q, t, n=2048).astype(jnp.float32)
    # cast the map to f32 (production dtype)
    m32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, m)
    return m32, pts, q, t, MAP_CFG


def test_pallas_matches_xla(scene):
    from jax.experimental.pallas import tpu as pltpu

    from mimosa_tpu.ops import icp_pallas as ip

    m, pts, q, t, map_cfg = scene
    cfg = geo.GeometricConfig(loc_count_thresh=30.0)
    valid = jnp.ones(pts.shape[0], bool)
    # slightly perturbed pose -> nonzero residuals
    q2, t2 = lie.se3_retract(q, t, jnp.asarray(
        [0.01, -0.02, 0.01, 0.05, -0.03, 0.02], jnp.float32))
    matches = geo.match(m, pts, q2, t2, map_cfg)
    ref = geo.linearize_with(matches, pts, valid, q2, t2, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = ip.linearize_pallas(matches, pts, valid, q2, t2, cfg)

    assert int(out.num_inlier) == int(ref.num_inlier)
    np.testing.assert_array_equal(np.asarray(out.status_counts),
                                  np.asarray(ref.status_counts))
    np.testing.assert_allclose(np.asarray(out.H), np.asarray(ref.H),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.b), np.asarray(ref.b),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(float(out.mean_abs_res),
                               float(ref.mean_abs_res), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.degenerate_trans),
                                  np.asarray(ref.degenerate_trans))
