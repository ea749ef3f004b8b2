"""Round-trip test of the pure-Python ROS1 bag reader against a
synthesized v2.0 bag file."""

import struct

import numpy as np

from mimosa_tpu.io import rosbag as rb
from mimosa_tpu.io.pointcloud2 import Field, structured_view


def _field(name: bytes, value: bytes) -> bytes:
    body = name + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) \
        + data


def _imu_body(stamp, acc, gyro):
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    b = struct.pack("<III", 0, secs, nsecs) + struct.pack("<I", 0)
    b += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0] * 9))
    b += struct.pack("<3d", *gyro) + struct.pack("<9d", *([0] * 9))
    b += struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9))
    return b


def _cloud_body(stamp, n=8):
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    b = struct.pack("<III", 0, secs, nsecs) + struct.pack("<I", 0)
    b += struct.pack("<II", 1, n)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 16, 7, 1), ("t", 20, 6, 1),
              ("reflectivity", 24, 4, 1), ("ring", 26, 4, 1)]
    b += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        nb = name.encode()
        b += struct.pack("<I", len(nb)) + nb
        b += struct.pack("<IBI", off, dt, cnt)
    step = 32
    data = np.zeros(n * step, np.uint8)
    v = structured_view(data, [Field(f[0], f[1], f[2]) for f in fields], step)
    v["x"] = np.arange(n, dtype=np.float32)
    v["t"] = (np.arange(n) * 100).astype(np.uint32)
    b += struct.pack("<B", 0)             # bigendian
    b += struct.pack("<II", step, step * n)
    b += struct.pack("<I", len(data)) + data.tobytes()
    b += struct.pack("<B", 1)             # is_dense
    return b


def _time(t):
    return struct.pack("<II", int(t), int(round((t - int(t)) * 1e9)))


def write_test_bag(path):
    chunks = b""
    # connection records
    conn0 = _record({b"op": b"\x07", b"conn": struct.pack("<I", 0),
                     b"topic": b"/imu"},
                    _field(b"type", b"sensor_msgs/Imu")
                    + _field(b"md5sum", b"x")
                    + _field(b"message_definition", b""))
    conn1 = _record({b"op": b"\x07", b"conn": struct.pack("<I", 1),
                     b"topic": b"/points"},
                    _field(b"type", b"sensor_msgs/PointCloud2")
                    + _field(b"md5sum", b"x")
                    + _field(b"message_definition", b""))
    msgs = b""
    for k in range(5):
        msgs += _record({b"op": b"\x02", b"conn": struct.pack("<I", 0),
                         b"time": _time(100.0 + k * 0.01)},
                        _imu_body(100.0 + k * 0.01, [0, 0, 9.81],
                                  [0.1, 0, 0]))
    msgs += _record({b"op": b"\x02", b"conn": struct.pack("<I", 1),
                     b"time": _time(100.05)}, _cloud_body(100.04))
    chunk_payload = conn0 + conn1 + msgs
    chunks += _record({b"op": b"\x05", b"compression": b"none",
                       b"size": struct.pack("<I", len(chunk_payload))},
                      chunk_payload)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
                         b"conn_count": struct.pack("<I", 2),
                         b"chunk_count": struct.pack("<I", 1)},
                        b"\x20" * 4096))
        f.write(chunks)


def test_bag_roundtrip(tmp_path):
    p = tmp_path / "test.bag"
    write_test_bag(p)
    bag = rb.Bag(p)
    msgs = bag.read_sorted()
    assert len(msgs) == 6
    imu = [m for m in msgs if m[0] == "/imu"]
    assert len(imu) == 5
    np.testing.assert_allclose(imu[0][3]["acc"], [0, 0, 9.81])
    np.testing.assert_allclose(imu[0][3]["gyro"], [0.1, 0, 0])
    assert abs(imu[0][3]["stamp"] - 100.0) < 1e-9
    cloud = [m for m in msgs if m[0] == "/points"][0][3]
    assert cloud["width"] == 8
    assert cloud["point_step"] == 32
    from mimosa_tpu.io import pointcloud2 as pc2
    out = pc2.decode(cloud["data"], cloud["fields"], cloud["point_step"])
    assert out["fmt"] == "ouster"
    np.testing.assert_allclose(out["points"][:, 0], np.arange(8))


def test_topic_filter(tmp_path):
    p = tmp_path / "test.bag"
    write_test_bag(p)
    only_imu = rb.Bag(p).read_sorted(topics={"/imu"})
    assert len(only_imu) == 5
    info = rb.Bag(p).topic_info()
    assert info["/imu"]["count"] == 5
    assert info["/points"]["type"] == "sensor_msgs/PointCloud2"
