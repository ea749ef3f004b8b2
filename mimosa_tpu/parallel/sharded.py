"""Multi-device sharding of the map and the ICP kernel over a TPU mesh.

The reference is single-process shared-memory (OpenMP over points,
reference geometric_factor.hpp:261-275); the TPU-native scale-out story
(SURVEY.md §2.5) is:

* **dp axis** — points/residuals sharded across devices (the DP analogue of
  the OpenMP loop): each device linearizes its point shard, normal
  equations are ``psum``-reduced over the mesh.
* **mp axis** — map voxel blocks sharded across devices (the TP/EP
  analogue): the voxel-hash table is a stack of independent sub-tables,
  voxels assigned to shards by high hash bits. Queries run against every
  sub-table and the best plane per point is combined with a min-distance
  reduction over ``mp``; inserts mask each point batch to the owning shard
  (no all-to-all needed — ownership is a pure hash function).

Everything rides XLA collectives (psum/pmin/all_gather) over ICI via
``shard_map`` — no NCCL/MPI anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mimosa_tpu.core import lie
from mimosa_tpu.core.eigh3 import eigh3
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


def make_mesh(n_devices=None, n_mp=None):
    """Build a ('dp', 'mp') mesh over the available devices.

    ``n_mp`` must be a power of two: voxel-shard ownership is a bitmask of
    the spatial hash (``_owner_ok``), so a non-power-of-two mp axis would
    silently leave shards with zero ownership (e.g. n_mp=3 assigns nothing
    to shard 1 under ``& (n_mp-1)``)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n_mp is None:
        n_mp = 2 if n % 2 == 0 and n >= 4 else 1
    if n_mp & (n_mp - 1) != 0 or n_mp < 1:
        raise ValueError(f"n_mp must be a power of two, got {n_mp}")
    n_dp = n // n_mp
    import numpy as np
    grid = np.asarray(devs[:n]).reshape(n_dp, n_mp)
    return Mesh(grid, ("dp", "mp"))


def create_sharded_map(cfg: vh.VoxelMapConfig, mesh: Mesh, dtype=jnp.float32):
    """Stacked sub-tables [n_mp, C_local+1, ...], sharded over 'mp' and
    replicated over 'dp'. Total capacity = n_mp * 2**capacity_log2."""
    n_mp = mesh.shape["mp"]
    one = vh.create(cfg, dtype)
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n_mp,) + a.shape), one)
    shard = NamedSharding(mesh, P("mp"))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), stacked)


def _owner_ok(points, leaf, n_mp, mp_idx, cap_log2):
    """Ownership mask: voxel belongs to this mp shard.

    Ownership bits MUST sit strictly above the slot-index bits — the slot
    is ``hash & (2**cap_log2 - 1)`` (mapping/voxel_hash.py _slot_of), so
    taking ownership from any bit below ``cap_log2`` would confine every
    voxel owned by shard i to the 1/n_mp fraction of its own sub-table
    where those bits equal i, wasting (n_mp-1)/n_mp of total capacity
    (round-1 bug: bit 17 was inside the capacity_log2=19 slot mask).
    Logical shift keeps the selector uniform for negative hashes."""
    if n_mp <= 1:
        h = vh.hash_coords(vh.voxel_coords(points, leaf))
        return jnp.ones(h.shape, bool)
    assert n_mp & (n_mp - 1) == 0, "n_mp must be a power of two"
    assert cap_log2 + (n_mp - 1).bit_length() <= 32, \
        "not enough hash bits above the slot index for this mp degree"
    h = vh.hash_coords(vh.voxel_coords(points, leaf))
    own = jax.lax.shift_right_logical(h, jnp.int32(cap_log2)) \
        & jnp.int32(n_mp - 1)
    return own == mp_idx


def sharded_insert(vmap_s, points, valid, scan_idx, map_cfg: vh.VoxelMapConfig,
                   mesh: Mesh):
    """Insert a (replicated) point batch into the mp-sharded map."""
    n_mp = mesh.shape["mp"]

    def body(local, pts, vd, idx):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        mp_i = jax.lax.axis_index("mp")
        own = _owner_ok(pts, jnp.asarray(map_cfg.leaf_size, pts.dtype),
                        n_mp, mp_i, map_cfg.capacity_log2)
        m, slots = vh.insert(local, pts, vd & own, idx, map_cfg,
                             return_slots=True)
        m = vh.evict_stale(m, idx, map_cfg)
        m = vh.update_planes_at(m, slots, map_cfg)
        return jax.tree_util.tree_map(lambda a: a[None], m)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("mp"), P(), P(), P()),
        out_specs=P("mp"),
        check_vma=False,
    )(vmap_s, points, valid, scan_idx)


def sharded_linearize(vmap_s, points_b, valid, q, t, g_dir,
                      map_cfg: vh.VoxelMapConfig, cfg: geo.GeometricConfig,
                      mesh: Mesh) -> geo.ICPResult:
    """Mesh-sharded ICP linearization: points over 'dp', map over 'mp'.

    Semantics match geo.linearize (same gates, Huber, localizability);
    plane candidates are combined across map shards by min distance-to-mean,
    and all reductions ride psum over both axes.
    """
    n_mp = mesh.shape["mp"]

    def body(local_map, pts_b, vd, q, t, g_dir):
        local_map = jax.tree_util.tree_map(lambda a: a[0], local_map)
        dtype = pts_b.dtype
        R = lie.quat_to_mat(q)
        p_w = pts_b @ R.T + t

        normal, mean, found = vh.query_planes(local_map, p_w, map_cfg)
        d = mean - p_w
        d2 = jnp.where(found, jnp.sum(d * d, axis=-1),
                       jnp.asarray(jnp.finfo(dtype).max, dtype))
        # cross-map-shard combine: winner = min distance-to-mean over 'mp'
        d2min = jax.lax.pmin(d2, "mp")
        is_win = found & (d2 <= d2min)
        # break ties (identical d2 on 2+ shards) by lowest mp index
        mp_i = jax.lax.axis_index("mp").astype(jnp.int32)
        win_rank = jnp.where(is_win, mp_i, jnp.int32(2**30))
        win_min = jax.lax.pmin(win_rank, "mp")
        is_win = is_win & (win_rank == win_min)
        wf = is_win.astype(dtype)[:, None]
        normal = jax.lax.psum(normal * wf, "mp")
        mean = jax.lax.psum(mean * wf, "mp")
        found = jax.lax.psum(is_win.astype(jnp.int32), "mp") > 0

        r = jnp.sum(normal * (p_w - mean), axis=-1)
        in_dist = jnp.abs(r) <= cfg.max_p2p_dist
        pn = jnp.sqrt(jnp.linalg.norm(pts_b, axis=-1) + 1e-12)
        s = 1.0 - 0.9 * jnp.abs(r) / pn
        in_s = s >= cfg.s_gate_min
        inlier = vd & found & in_dist & in_s
        ar = jnp.abs(r)
        w_h = jnp.where(ar <= cfg.huber_delta, 1.0,
                        cfg.huber_delta / jnp.maximum(ar, 1e-12))
        w = jnp.where(inlier, w_h, 0.0) / (cfg.sigma ** 2)

        nR = normal @ R
        j_rot = jnp.cross(pts_b, nR)
        J = jnp.concatenate([j_rot, nR], axis=-1)

        def allsum(x):
            return jax.lax.psum(jax.lax.psum(x, "dp"), "mp") / n_mp
        # NOTE: per-point quantities are replicated over 'mp' after the
        # combine above, so the mp-psum overcounts by n_mp; dividing keeps
        # one logical copy. dp genuinely partitions points.

        H = allsum(jnp.einsum("ni,nj,n->ij", J, J, w))
        b = allsum(jnp.einsum("ni,n->i", J, w * r))

        st_no_plane = vd & ~found
        st_dist = vd & found & ~in_dist
        st_sgate = vd & found & in_dist & ~in_s
        counts = allsum(jnp.stack([
            jnp.sum(inlier), jnp.sum(st_no_plane), jnp.sum(st_dist),
            jnp.sum(st_sgate)]).astype(dtype)).astype(jnp.int32)

        m = inlier.astype(dtype)
        Hrr = allsum(jnp.einsum("ni,nj,n->ij", j_rot, j_rot, m))
        Htt = allsum(jnp.einsum("ni,nj,n->ij", nR, nR, m))
        lam_r, V_r = eigh3(Hrr)
        lam_t, V_t = eigh3(Htt)
        cnt_r = allsum(jnp.sum(
            ((jnp.abs(j_rot @ V_r) >= cfg.loc_proj_cutoff)
             & inlier[:, None]).astype(dtype), axis=0))
        cnt_t = allsum(jnp.sum(
            ((jnp.abs(nR @ V_t) >= cfg.loc_proj_cutoff)
             & inlier[:, None]).astype(dtype), axis=0))
        # separate rot/trans thresholds, matching the single-chip kernel
        # (lidar/geometric.py:144) and the reference's degen_thresh_rot /
        # degen_thresh_trans (geometric_config.hpp:31-32; configs often set
        # rot to 0 = rotation never flagged degenerate)
        degen_r = cnt_r < cfg.loc_count_thresh_rot
        degen_t = cnt_t < cfg.loc_count_thresh
        mean_abs = allsum(jnp.sum(ar * m)) / jnp.maximum(
            allsum(jnp.sum(m)), 1.0)

        if cfg.use_4dof:
            a_body = R.T @ g_dir
            a_body = a_body / jnp.maximum(jnp.linalg.norm(a_body), 1e-9)
            P6 = jnp.zeros((6, 6), dtype).at[:3, :3].set(
                jnp.outer(a_body, a_body))
            P6 = P6.at[3:, 3:].set(jnp.eye(3, dtype=dtype))
            H = P6 @ H @ P6.T
            b = P6 @ b

        return geo.ICPResult(H, b, counts[0], counts, mean_abs, cnt_r, cnt_t,
                             lam_r, lam_t, V_r, V_t, degen_r, degen_t)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("mp"), P("dp"), P("dp"), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(vmap_s, points_b, valid, q, t, g_dir)


def sequencer_fns(mesh, map_cfg: vh.VoxelMapConfig, cfg: geo.GeometricConfig):
    """(linearize_fn, map_update_fn) closures that swap the mesh-sharded
    ICP kernel + map insert into the sequencer's device programs
    (``Sequencer(mesh=...)`` / make_sharded_scan_step)."""

    def linearize_fn(vmap_s, pts, valid, q, t, g_dir):
        pts = jax.lax.with_sharding_constraint(
            pts, NamedSharding(mesh, P("dp")))
        return sharded_linearize(vmap_s, pts, valid, q, t, g_dir,
                                 map_cfg, cfg, mesh)

    def map_update_fn(vmap_s, pts, valid, idx):
        return sharded_insert(vmap_s, pts, valid, idx, map_cfg, mesh)

    return linearize_fn, map_update_fn


def radar_linearize_fn(mesh, radar_cfg):
    """dp-sharded Doppler linearize closure for ``Sequencer(mesh=...)``."""

    def linearize_fn(q, v, bg, omega, dirs, doppler, valid):
        dirs = jax.lax.with_sharding_constraint(
            dirs, NamedSharding(mesh, P("dp")))
        return sharded_radar_linearize(q, v, bg, omega, dirs, doppler,
                                       valid, radar_cfg, mesh)

    return linearize_fn


def make_sharded_scan_step(mesh, seq_cfg, win_cfg, map_cfg, geo_cfg,
                           photo_cfg=None, static_mask=None):
    """The full per-scan training step with mesh-sharded ICP, jitted.
    Drop-in for the single-chip _scan_step (same signature, sharded map).

    With ``photo_cfg`` the photometric module joins the step exactly as on
    a single chip (the reference runs every modality through one define
    path, graph/manager.cpp:578-620): the image build + patch factor run
    replicated on the mesh — at <=1k features the 6x6 block is far below
    the collective latency floor, so sharding it would only add psum
    rounds; the dominant per-point ICP work stays dp/mp-sharded."""
    from mimosa_tpu.graph import sequencer as sq

    linearize_fn, map_update_fn = sequencer_fns(mesh, map_cfg, geo_cfg)
    step = functools.partial(sq._scan_step, seq_cfg=seq_cfg, win_cfg=win_cfg,
                             map_cfg=map_cfg, geo_cfg=geo_cfg,
                             photo_cfg=photo_cfg, static_mask=static_mask,
                             linearize_fn=linearize_fn,
                             map_update_fn=map_update_fn)
    return jax.jit(step)


def sharded_radar_linearize(q_wb, v_w, bg, omega_b, dirs_r, doppler, valid,
                            radar_cfg, mesh):
    """Doppler 9x9 block with targets sharded over 'dp' (psum-reduced) —
    the multi-chip analogue of the per-target loop in the reference's
    DopplerHessianFactor::linearize (radar/factor.hpp:98-186)."""
    from mimosa_tpu.radar import factor as rad

    n_mp = mesh.shape["mp"]

    def body(q, v, b, om, d_, dop, vd):
        res = rad.linearize(q, v, b, om, d_, dop, vd, radar_cfg)

        def allsum(x):
            return jax.lax.psum(jax.lax.psum(x, "dp"), "mp") / n_mp

        n = res.num_inlier.astype(res.H.dtype)
        sum_abs = res.mean_abs_res * jnp.maximum(n, 1.0)
        n_tot = allsum(n)
        return rad.DopplerResult(
            allsum(res.H), allsum(res.b), n_tot.astype(jnp.int32),
            allsum(sum_abs) / jnp.maximum(n_tot, 1.0))

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("dp"), P("dp"), P("dp")),
        out_specs=P(),
        check_vma=False,
    )(q_wb, v_w, bg, omega_b, dirs_r, doppler, valid)


def make_sharded_radar_step(mesh, seq_cfg, win_cfg, radar_cfg, declare=True):
    """One-step Doppler declare+define on the mesh: targets over 'dp'.
    Drop-in for the single-chip _radar_step (same signature)."""
    from mimosa_tpu.graph import sequencer as sq

    step = functools.partial(sq._radar_step, declare=declare,
                             seq_cfg=seq_cfg, win_cfg=win_cfg,
                             radar_cfg=radar_cfg,
                             linearize_fn=radar_linearize_fn(mesh, radar_cfg))
    return jax.jit(step)


def make_sharded_odom_step(mesh, seq_cfg, win_cfg, odom_cfg, declare=True):
    """Odometry between-factor declare+define jitted over the mesh. A single
    6-dof relative measurement has nothing to shard (the reference builds
    one BetweenFactor per message, odometry/manager.cpp:43-58); running it
    replicated keeps the whole multi-modality program on one mesh so radar/
    odom declares interleave with sharded scans without host round-trips."""
    from mimosa_tpu.graph import sequencer as sq

    step = functools.partial(sq._odom_step, declare=declare, seq_cfg=seq_cfg,
                             win_cfg=win_cfg, odom_cfg=odom_cfg)
    return jax.jit(step)
