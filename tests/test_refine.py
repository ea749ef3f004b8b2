"""Unit tests for the batch-smoothing input bookkeeping (graph/refine.py
consumes pose_info_records; the heavy end-to-end path is gated by
tests/test_e2e_synthetic.py::test_e2e_batch_smoothing)."""

import jax.numpy as jnp
import numpy as np

from mimosa_tpu.graph import sequencer as seq
from mimosa_tpu.graph import window as win
from mimosa_tpu.lidar import geometric as geo
from mimosa_tpu.mapping import voxel_hash as vh


def small_sequencer():
    return seq.Sequencer(
        seq_cfg=seq.SequencerConfig(max_scan_points=1024, n_geo_points=256,
                                    n_map_points=256, max_keyframes=16,
                                    max_trajectory=16),
        win_cfg=win.WindowConfig(K=4),
        map_cfg=vh.VoxelMapConfig(capacity_log2=10),
        geo_cfg=geo.GeometricConfig())


def test_pose_info_records_mapping():
    """Rows map to their source scan's triu-packed [6,6] quadratic; rows
    declared by radar/odometry/init (src -1) stay zero."""
    s = small_sequencer()
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6)).astype(np.float32)
    H = A @ A.T
    iu = np.triu_indices(6)
    s._traj_ts = [0.0, 0.1, 0.2]
    s._traj_src = [-1, 0, -1]          # row 1 came from scan 0
    s.scan_idx = 1
    # cols 17:38 = the triu6 pose quadratic (the ring widened to 47 with
    # the IMU-localizability block at 38:47 — sequencer.DBG_W)
    s.debug_rec = s.debug_rec.at[0, 17:38].set(jnp.asarray(H[iu]))
    out = s.pose_info_records()
    assert out.shape == (3, 6, 6)
    np.testing.assert_allclose(out[1], H, rtol=1e-6)
    assert np.all(out[0] == 0) and np.all(out[2] == 0)
    # symmetric by construction
    np.testing.assert_allclose(out[1], out[1].T)


def test_debug_records_view_unchanged():
    """debug_records() keeps the 17-column status layout regardless of
    the widened ring."""
    s = small_sequencer()
    s.scan_idx = 2
    s.debug_rec = s.debug_rec.at[1, 0].set(123.0).at[1, 30].set(9.0)
    rec = s.debug_records()
    assert rec.shape == (2, 17)
    assert rec[1, 0] == 123.0
