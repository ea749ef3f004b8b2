"""Native C++ decode path vs the numpy reference implementation."""

import numpy as np
import pytest

from mimosa_tpu import native
from mimosa_tpu.io import pointcloud2 as pc2
from test_pointcloud2 import make_ouster_cloud


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_builds(lib):
    assert lib is not None


def test_native_matches_numpy(lib):
    buf, fields, step, xyz, inten, t, ring = make_ouster_cloud(n=512, seed=1)
    kwargs = dict(range_min=2.0, range_max=15.0, intensity_min=20.0,
                  intensity_max=240.0, point_skip=2, ring_skip=2)
    nx, ni, nt, nr = native.decode_filtered(buf, fields, step, 512, **kwargs)

    d = pc2.decode(buf, fields, step)
    ok = pc2.point_filters(d["points"], d["intensity"], d["ring"], **kwargs)
    idx = np.nonzero(ok)[0]
    np.testing.assert_allclose(nx, d["points"][idx], atol=0)
    np.testing.assert_allclose(ni, d["intensity"][idx], atol=0)
    np.testing.assert_allclose(nt, d["t_rel"][idx], atol=1e-12)
    np.testing.assert_array_equal(nr, d["ring"][idx])


def test_native_max_out_truncates(lib):
    buf, fields, step, *_ = make_ouster_cloud(n=512, seed=2)
    nx, ni, nt, nr = native.decode_filtered(
        buf, fields, step, 100, range_min=0.1, range_max=1000.0)
    assert len(nx) == 100


def test_native_nan_rejected(lib):
    buf, fields, step, *_ = make_ouster_cloud(n=16, seed=3)
    v = pc2.structured_view(buf, fields, step)
    x = np.array(v["x"])
    x[3] = np.nan
    v["x"] = x
    nx, *_ = native.decode_filtered(buf, fields, step, 16, range_min=0.0,
                                    range_max=1000.0)
    assert len(nx) == 15
    assert np.isfinite(nx).all()


def test_ring_sort(lib):
    import ctypes
    rings = np.asarray([3, 0, 1, 0, 2, 1, 3, 0], np.int32)
    idx = np.empty(8, np.int64)
    scratch = np.empty(16 + 1, np.int64)
    lib.mimosa_ring_sort(
        rings.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(8), ctypes.c_int32(16),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    # ring-major, stable within ring
    np.testing.assert_array_equal(idx, [1, 3, 7, 2, 5, 4, 0, 6])


def test_ring_sort_wrapper_matches_numpy():
    """native.ring_sort (counting sort) == stable argsort with the same
    out-of-range clamp, for both backends."""
    rng = np.random.default_rng(3)
    rings = rng.integers(-2, 132, size=4096).astype(np.int32)
    n_rings = 128
    idx = native.ring_sort(rings, n_rings)
    r = np.where((rings < 0) | (rings >= n_rings), n_rings - 1, rings)
    ref = np.argsort(r, kind="stable")
    np.testing.assert_array_equal(idx, ref)
    # permutation property
    assert sorted(idx.tolist()) == list(range(len(rings)))


def _pack_inputs(seed, n=257, with_valid=True, with_inten=True, nan_frac=0.1):
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=20.0, size=(n, 3))
    t = rng.uniform(0.0, 0.1, size=n)
    if nan_frac:
        bad = rng.random(n) < nan_frac
        pts[bad, rng.integers(0, 3)] = np.nan
        t[rng.random(n) < nan_frac / 2] = np.inf
    valid = rng.random(n) < 0.9 if with_valid else None
    inten = rng.uniform(0.0, 300.0, size=n) if with_inten else None
    return pts, t, valid, inten


@pytest.mark.parametrize("skip,n_out,ncol,with_valid,with_inten", [
    (1, 512, 4, True, False),
    (4, 64, 5, True, True),
    (2, 40, 5, False, True),   # truncation, no explicit valid
    (3, 512, 4, False, False),
])
def test_pack_scan_native_matches_numpy(lib, skip, n_out, ncol,
                                        with_valid, with_inten):
    pts, t, valid, inten = _pack_inputs(7 + skip, with_valid=with_valid,
                                        with_inten=with_inten)
    args = (pts, t, valid, inten if ncol > 4 else None,
            skip, n_out, ncol, 0.01, 2e-6, 0.1)
    out_n, te_n = native.pack_scan(*args)
    # force the numpy fallback for comparison
    saved = native._LIB, native._LIB_FAILED
    try:
        native._LIB, native._LIB_FAILED = None, True
        out_p, te_p = native.pack_scan(*args)
    finally:
        native._LIB, native._LIB_FAILED = saved
    np.testing.assert_array_equal(out_n, out_p)
    assert te_n == te_p


def test_pack_scan_semantics(lib):
    pts = np.array([[1.0, 2.0, 3.0],
                    [np.nan, 0.0, 0.0],
                    [0.5, -0.5, 0.25],
                    [4.0, 4.0, 4.0]])
    t = np.array([0.0, 0.01, 0.02, 0.09])
    valid = np.array([True, True, True, False])
    out, t_end = native.pack_scan(pts, t, valid, None, 1, 6, 4,
                                  0.01, 2e-6, 0.1, dither=False)
    # t_end over valid ∩ finite lanes of the full input: lane 3 invalid,
    # lane 1 NaN -> max is t[2]
    assert t_end == 0.02
    assert out[0, 0] == 100 and out[0, 1] == 200 and out[0, 2] == 300
    assert out[1, 3] == -32768          # NaN point -> sentinel
    assert out[3, 3] == -32768          # masked-out point -> sentinel
    assert (out[4:, 3] == -32768).all()  # padding -> sentinel
    assert out[2, 3] == round(0.02 / 2e-6) - 32767


def test_pack_scan_dither(lib):
    """Subtractive dither round trip: native == numpy fallback
    bit-identically, deterministic, decode error stays ≤ ~0.5 LSB + the
    f32 hash mismatch, and the decoded values de-alias an exactly gridded
    input (the staircase pathology the dither exists for)."""
    import jax.numpy as jnp
    from mimosa_tpu.graph.sequencer import _dither_lanes

    rng = np.random.default_rng(11)
    res = 0.005
    # points exactly ON the quantization lattice (the pathological case)
    pts = np.round(rng.normal(scale=5.0, size=(512, 3)) / res) * res
    t = rng.uniform(0, 0.1, 512)
    args = (pts, t, None, None, 2, 256, 4, res, 2e-6, 0.1)
    d1, te1 = native.pack_scan(*args, dither=True)
    d2, _ = native.pack_scan(*args, dither=True)
    np.testing.assert_array_equal(d1, d2)          # deterministic
    saved = native._LIB, native._LIB_FAILED
    try:
        native._LIB, native._LIB_FAILED = None, True
        f, tef = native.pack_scan(*args, dither=True)
    finally:
        native._LIB, native._LIB_FAILED = saved
    np.testing.assert_array_equal(d1, f)
    assert te1 == tef

    # decode exactly as the device program does (_decode_scan)
    dith = np.asarray(_dither_lanes(256, np.dtype(np.float32)))
    dec = (d1[:, :3].astype(np.float32) - dith) * res
    err = np.abs(dec - pts[::2][:256].astype(np.float32))
    assert err.max() <= 0.51 * res
    # a perfectly flat on-lattice floor: undithered decode collapses every
    # z to one value (the staircase); subtractive decode spreads the
    # reconstruction so downstream plane fits see no lattice
    flat = pts.copy()
    flat[:, 2] = 1.0
    dq, _ = native.pack_scan(flat, t, None, None, 1, 512, 4, res, 2e-6,
                             0.1, dither=True)
    uq, _ = native.pack_scan(flat, t, None, None, 1, 512, 4, res, 2e-6,
                             0.1, dither=False)
    assert len(np.unique(uq[:, 2])) == 1
    dith512 = np.asarray(_dither_lanes(512, np.dtype(np.float32)))
    dec_z = (dq[:, 2].astype(np.float32) - dith512[:, 2]) * res
    assert len(np.unique(dec_z)) > 100
    assert np.abs(dec_z - 1.0).max() <= 0.51 * res


def test_organize_by_ring_skip_semantics():
    """Point skipping on a ring-INTERLEAVED cloud: in arrival order a skip
    divisor equal to the ring count would keep only ring 0; organized
    ring-major (ref lidar/manager.cpp:205-242) every ring keeps ~1/skip of
    its points."""
    n_rings, per_ring, skip = 4, 64, 4
    # column-major arrival: ring index changes fastest
    rings = np.tile(np.arange(n_rings, dtype=np.int32), per_ring)
    # arrival-order skip loses every ring but 0
    keep_arrival = (np.arange(len(rings)) % skip) == 0
    assert set(rings[keep_arrival]) == {0}
    # ring-major skip keeps every ring
    order = native.ring_sort(rings, n_rings)
    keep = np.zeros(len(rings), bool)
    keep[order[::skip]] = True
    kept_per_ring = [int(np.sum(keep & (rings == r)))
                     for r in range(n_rings)]
    assert kept_per_ring == [per_ring // skip] * n_rings


@pytest.mark.parametrize("skip,n_out,ncol,with_beam", [
    (1, 512, 2, False),
    (4, 64, 3, False),
    (1, 257, 3, True),     # affine Ouster beam table, exact fit
    (2, 100, 2, True),     # skip + truncation with beam table
])
def test_pack_range_native_matches_numpy(lib, skip, n_out, ncol,
                                         with_beam):
    """pack_range native vs numpy fallback must be BIT-identical —
    including the affine beam-table path (advisor r3: the two previously
    used divide vs multiply-by-reciprocal, a 1-ULP difference at rounding
    boundaries, and one quantization-LSB flip decides convergence on
    marginal scenes)."""
    pts, t, valid, inten = _pack_inputs(11 + skip)
    beam = None
    if with_beam:
        rng = np.random.default_rng(5)
        dirs = rng.normal(size=(n_out, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        off = rng.normal(scale=0.03, size=(n_out, 3))
        beam = np.concatenate([dirs, off], -1).astype(np.float32)
    args = (pts, t, valid, inten if ncol > 2 else None,
            skip, n_out, ncol, 0.005, 2e-6, 0.1)
    out_n, te_n = native.pack_range(*args, beam=beam)
    saved = native._LIB, native._LIB_FAILED
    try:
        native._LIB, native._LIB_FAILED = None, True
        out_p, te_p = native.pack_range(*args, beam=beam)
    finally:
        native._LIB, native._LIB_FAILED = saved
    np.testing.assert_array_equal(out_n, out_p)
    assert te_n == te_p
