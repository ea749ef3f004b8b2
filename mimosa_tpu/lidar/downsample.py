"""One-shot voxel-grid downsampling of padded point batches.

Replaces the reference's hash-map + FlatContainerMinimal downsample
(reference src/lidar/geometric.cpp:55-126, include/mimosa/lidar/
utils.hpp:240-294): keep (up to) one representative point per voxel, chosen
as the lane with the smallest key — deterministic, race-free, and shape-
static, so the whole pass lives inside jit. The reference's per-voxel
min-dist/max-count container semantics collapse to "first (lowest-index)
point per voxel wins", which matches its ``max_num_points_in_cell: 1``
configs (mimosa/config/enwide/params.yaml geometric downsample block).

Output is a fixed-size [M,3] array + validity mask (selected lanes first,
order by input index), produced by a stable sort on the keep flag.
"""

from __future__ import annotations

import jax.numpy as jnp

from mimosa_tpu.mapping.voxel_hash import hash_coords, voxel_coords


def voxel_downsample(points, valid, leaf_size, max_out, table_log2=18):
    """points [N,3], valid [N] -> (out [M,3], out_valid [M], sel_idx [M]).

    ``max_out`` = M is static. Uses a scratch claim table of 2^table_log2
    slots; rare hash collisions merge distinct voxels (acceptable for
    downsampling — it only drops a point that a nearby voxel kept).
    """
    n = points.shape[0]
    cap = 1 << table_log2
    mask = cap - 1
    vc = voxel_coords(points, jnp.asarray(leaf_size, points.dtype))
    h = hash_coords(vc) & jnp.int32(mask)
    lane = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(valid, h, cap)
    claims = jnp.full(cap + 1, n, jnp.int32).at[tgt].min(lane)
    keep = valid & (claims[h] == lane)
    # compact: stable-sort by (not keep) so kept lanes come first in order
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    sel = order[:max_out]
    out_valid = keep[sel]
    out = jnp.where(out_valid[:, None], points[sel], 0.0)
    return out, out_valid, jnp.where(out_valid, sel, -1)
