import numpy as np
import pytest

from mimosa_tpu.io import pointcloud2 as pc2


def make_ouster_cloud(n=64, seed=0):
    """Synthesize a PointOuster-layout binary buffer (48-byte stride like
    PCL-aligned structs)."""
    rng = np.random.default_rng(seed)
    step = 32
    fields = [
        pc2.Field("x", 0, 7), pc2.Field("y", 4, 7), pc2.Field("z", 8, 7),
        pc2.Field("intensity", 16, 7), pc2.Field("t", 20, 6),
        pc2.Field("reflectivity", 24, 4), pc2.Field("ring", 26, 4),
    ]
    buf = np.zeros(n * step, np.uint8)
    xyz = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, size=n).astype(np.float32)
    t = (np.arange(n) * 1000).astype(np.uint32)  # ns
    ring = (np.arange(n) % 16).astype(np.uint16)
    v = pc2.structured_view(buf, fields, step)
    v["x"], v["y"], v["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    v["intensity"] = inten
    v["t"] = t
    v["ring"] = ring
    return buf, fields, step, xyz, inten, t, ring


def test_detect_ouster():
    buf, fields, step, *_ = make_ouster_cloud()
    assert pc2.detect_format(fields) == "ouster"


def test_decode_ouster_roundtrip():
    buf, fields, step, xyz, inten, t, ring = make_ouster_cloud()
    out = pc2.decode(buf, fields, step)
    np.testing.assert_allclose(out["points"], xyz, atol=0)
    np.testing.assert_allclose(out["intensity"], inten, atol=0)
    np.testing.assert_allclose(out["t_rel"], t * 1e-9, atol=1e-15)
    np.testing.assert_array_equal(out["ring"], ring.astype(np.int32))


def test_detect_velodyne_and_hesai():
    vel = [pc2.Field("x", 0, 7), pc2.Field("y", 4, 7), pc2.Field("z", 8, 7),
           pc2.Field("intensity", 12, 7), pc2.Field("ring", 16, 4),
           pc2.Field("time", 18, 7)]
    assert pc2.detect_format(vel) == "velodyne"
    hes = [pc2.Field("x", 0, 7), pc2.Field("y", 4, 7), pc2.Field("z", 8, 7),
           pc2.Field("intensity", 12, 7), pc2.Field("timestamp", 16, 8),
           pc2.Field("ring", 24, 4)]
    assert pc2.detect_format(hes) == "hesai"


def test_hesai_absolute_timestamps():
    step = 32
    fields = [pc2.Field("x", 0, 7), pc2.Field("y", 4, 7),
              pc2.Field("z", 8, 7), pc2.Field("intensity", 12, 7),
              pc2.Field("timestamp", 16, 8), pc2.Field("ring", 24, 4)]
    n = 10
    buf = np.zeros(n * step, np.uint8)
    v = pc2.structured_view(buf, fields, step)
    stamp = 1.7e9
    v["timestamp"] = stamp + np.arange(n) * 1e-4
    v["x"] = 1.0
    out = pc2.decode(buf, fields, step, header_stamp=stamp)
    # f64 epoch stamps carry ~0.5 us quantization — that's the format's
    # intrinsic limit, far below deskew needs
    np.testing.assert_allclose(out["t_rel"], np.arange(n) * 1e-4, atol=1e-6)


def test_unknown_format_raises():
    bad = [pc2.Field("x", 0, 7), pc2.Field("y", 4, 7), pc2.Field("z", 8, 7),
           pc2.Field("mystery", 12, 7)]
    with pytest.raises(ValueError, match="unknown point format"):
        pc2.detect_format(bad)


def test_point_filters():
    pts = np.asarray([[1.0, 0, 0], [0.05, 0, 0], [200.0, 0, 0],
                      [np.nan, 0, 0], [5.0, 0, 0], [6.0, 0, 0]],
                     np.float32)
    inten = np.asarray([10, 10, 10, 10, 0.5, 10], np.float32)
    ring = np.asarray([0, 0, 0, 0, 0, 1], np.int32)
    ok = pc2.point_filters(pts, inten, ring, range_min=0.2, range_max=100,
                           intensity_min=1.0, ring_skip=2)
    np.testing.assert_array_equal(ok, [True, False, False, False, False,
                                       False])
    ok2 = pc2.point_filters(pts, inten, ring, range_min=0.2, range_max=100,
                            intensity_min=1.0)
    np.testing.assert_array_equal(ok2, [True, False, False, False, False,
                                        True])


def test_time_base_matches_decode():
    """time_base's (scale, offset) must reproduce decode's header-relative
    t_rel for representative formats (the native fused decode consumes the
    scalars instead of branching per format)."""
    header = 1234.5
    # ouster: ns relative to header
    buf, fields, step, _, _, t, _ = make_ouster_cloud(n=32, seed=2)
    d = pc2.decode(buf, fields, step, header_stamp=header)
    sc, off = pc2.time_base(d["fmt"], header)
    v = pc2.structured_view(buf, fields, step)
    np.testing.assert_allclose(v["t"].astype(np.float64) * sc - off,
                               d["t_rel"], atol=1e-12)
    assert pc2.time_base("hesai", header) == (1.0, header)
    assert pc2.time_base("livox", header) == (1e-9, header)
    assert pc2.time_base("velodyne", header) == (1.0, 0.0)
