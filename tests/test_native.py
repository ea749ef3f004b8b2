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
