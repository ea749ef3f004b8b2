"""Native (C++) host-runtime components, loaded via ctypes.

Compiled lazily on first use with g++ (cached in the package dir); every
entry point has a pure-numpy fallback so the framework works without a
toolchain. Currently: the scan ingestion pass (decode + filter,
``decode.cc``) — the counterpart of the reference's C++ prepareInput.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False

_DTYPE_CODE = {None: 0, np.dtype(np.int8): 1, np.dtype(np.uint8): 2,
               np.dtype(np.int16): 3, np.dtype(np.uint16): 4,
               np.dtype(np.int32): 5, np.dtype(np.uint32): 6,
               np.dtype(np.float32): 7, np.dtype(np.float64): 8}


def _build():
    so = os.path.join(_HERE, "_native.so")
    src = os.path.join(_HERE, "decode.cc")
    newest_src = max(os.path.getmtime(os.path.join(_HERE, f))
                     for f in ("decode.cc", "pack.inc"))
    if not os.path.exists(so) or os.path.getmtime(so) < newest_src:
        base = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", src, "-o", so]
        # -fopenmp parallelizes the pack hot loops (pack.inc pragmas,
        # bit-identical chunked reduction); fall back to serial when the
        # toolchain lacks it
        try:
            subprocess.run(base[:-3] + ["-fopenmp"] + base[-3:],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True)
    return so


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
            lib.mimosa_decode_filtered.restype = ctypes.c_int64
            lib.mimosa_ring_sort.restype = ctypes.c_int64
            lib.mimosa_pack_scan.restype = ctypes.c_int64
            lib.mimosa_pack_range.restype = ctypes.c_int64
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB


def _cptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def decode_filtered(data, fields, point_step, max_out, t_scale=1e-9,
                    t_offset=0.0, range_min=0.2, range_max=100.0,
                    intensity_min=0.0, intensity_max=1e18, point_skip=1,
                    ring_skip=1):
    """Fused decode + filter of a raw cloud buffer into dense arrays.

    fields: iterable of pointcloud2.Field. Returns (xyz [k,3] f32,
    intensity [k] f32, t_rel [k] f64, ring [k] i32) with k <= max_out.
    Uses the native pass when available, numpy otherwise (identical output).
    """
    from mimosa_tpu.io import pointcloud2 as pc2

    by_name = {f.name: f for f in fields}
    fmt = pc2.detect_format(fields)
    tf = {"ouster": "t", "ouster_r8": "t", "ouster_odyssey": "t",
          "livox_custom2": "t", "internal": "t", "livox": "timestamp",
          "hesai": "timestamp", "rslidar": "timestamp",
          "velodyne": "time", "velodyne_anybotics": "time"}[fmt]
    ring_f = by_name.get("ring") or by_name.get("line")
    sel = [by_name.get("x"), by_name.get("y"), by_name.get("z"),
           by_name.get("intensity"), by_name.get(tf), ring_f]
    offsets = np.asarray([f.offset if f else 0 for f in sel], np.int64)
    dtypes = np.asarray(
        [_DTYPE_CODE[np.dtype(pc2._DTYPES[f.datatype])] if f else 0
         for f in sel], np.int32)

    buf = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data.view(np.uint8).reshape(-1)
    n = len(buf) // point_step

    lib = get_lib()
    if lib is not None:
        xyz = np.empty((max_out, 3), np.float32)
        inten = np.empty(max_out, np.float32)
        t = np.empty(max_out, np.float64)
        ring = np.empty(max_out, np.int32)
        k = lib.mimosa_decode_filtered(
            _cptr(buf, ctypes.c_uint8), ctypes.c_int64(n),
            ctypes.c_int64(point_step), _cptr(offsets, ctypes.c_int64),
            _cptr(dtypes, ctypes.c_int32), ctypes.c_double(t_scale),
            ctypes.c_double(t_offset), ctypes.c_double(range_min),
            ctypes.c_double(range_max), ctypes.c_double(intensity_min),
            ctypes.c_double(intensity_max), ctypes.c_int64(point_skip),
            ctypes.c_int64(ring_skip), ctypes.c_int64(max_out),
            _cptr(xyz, ctypes.c_float), _cptr(inten, ctypes.c_float),
            _cptr(t, ctypes.c_double), _cptr(ring, ctypes.c_int32))
        return xyz[:k], inten[:k], t[:k], ring[:k]

    # numpy fallback (same semantics)
    d = pc2.decode(buf, fields, point_step)
    t_rel = d["t_rel"] if tf != "t" else d["t_rel"]
    # pc2.decode already applies t scaling per format; recompute with the
    # caller's t_scale/t_offset for exact parity with the native path
    v = pc2.structured_view(buf, fields, point_step)
    t_raw = v[tf].astype(np.float64) if tf in v.dtype.names else \
        np.zeros(n)
    t_rel = t_raw * t_scale - t_offset
    ok = pc2.point_filters(d["points"], d["intensity"], d["ring"],
                           range_min=range_min, range_max=range_max,
                           intensity_min=intensity_min,
                           intensity_max=intensity_max,
                           point_skip=point_skip, ring_skip=ring_skip)
    idx = np.nonzero(ok)[0][:max_out]
    return (d["points"][idx], d["intensity"][idx], t_rel[idx],
            d["ring"][idx])


def ring_sort(rings, n_rings):
    """Ring-major stable permutation of point indices (the reference's
    organize_pointcloud_by_ring, src/lidar/manager.cpp:205-242): points
    ordered by ring ascending, arrival-stable within a ring; rings outside
    [0, n_rings) clamp to the last ring. Returns idx (int64 [n]) such that
    arrays[idx] is ring-major. Native counting sort when available,
    numpy stable argsort otherwise (identical output)."""
    rings = np.ascontiguousarray(np.asarray(rings, np.int32))
    n = len(rings)
    lib = get_lib()
    if lib is not None and n_rings >= 1:
        idx = np.empty(n, np.int64)
        scratch = np.empty(n_rings + 1, np.int64)
        lib.mimosa_ring_sort(
            _cptr(rings, ctypes.c_int32), ctypes.c_int64(n),
            ctypes.c_int32(n_rings), _cptr(idx, ctypes.c_int64),
            _cptr(scratch, ctypes.c_int64))
        return idx
    r = np.where((rings < 0) | (rings >= n_rings), n_rings - 1, rings)
    return np.argsort(r, kind="stable").astype(np.int64)


def _dither01(idx, salt):
    """Deterministic per-lane dither in [-0.5, 0.5): bit-identical to the
    C++ dither01 (Knuth multiplicative hash + xorshift finalizer)."""
    h = (idx.astype(np.uint64) * np.uint64(2654435761)).astype(np.uint32) \
        ^ np.uint32(salt)
    h ^= h >> np.uint32(16)
    h = (h.astype(np.uint64) * np.uint64(2246822519)).astype(np.uint32)
    h ^= h >> np.uint32(13)
    return h.astype(np.float64) / 4294967296.0 - 0.5


_DITHER_SALTS = (0xA511E9B3, 0x63D83595, 0x1B873593)


def pack_scan(points, t_rel, valid, intensity, skip, n_out, ncol,
              pos_res, t_res, int_res, dither=True, out=None):
    """Fused scan staging pack: point-skip + pad/truncate + int16
    quantization with the t == -32768 invalid-lane sentinel in one native
    pass (the host hot path of Sequencer.stage_scan). Returns
    (out int16 [n_out, ncol], t_end) where t_end is the max t over valid
    lanes of the FULL-density input (before skipping). ``dither`` adds a
    deterministic per-lane subtractive dither of ±0.5 LSB to the position
    quantizer — without it, low-noise scans snap to the quantization
    lattice and the gridded points bias voxel plane normals (staircase
    aliasing) badly enough to halve ICP inliers. Numpy fallback is
    bit-identical. ``out`` (int16 [n_out, ncol] C-contiguous, optional)
    receives the pack in place — the bulk-replay path packs a whole chunk
    into one preallocated [C, n_out, ncol] array slice by slice."""
    points = np.ascontiguousarray(points)
    t_rel = np.ascontiguousarray(t_rel)
    if points.dtype not in (np.float32, np.float64):
        points = points.astype(np.float64)
    if t_rel.dtype not in (np.float32, np.float64):
        t_rel = t_rel.astype(np.float64)
    n_in = len(points)
    if out is not None:
        assert out.dtype == np.int16 and out.shape == (n_out, ncol) \
            and out.flags.c_contiguous
    lib = get_lib()
    if lib is not None:
        dt = {np.dtype(np.float32): 7, np.dtype(np.float64): 8}
        if out is None:
            out = np.empty((n_out, ncol), np.int16)
        t_end = ctypes.c_double(0.0)
        vd = None
        if valid is not None:
            vd = np.ascontiguousarray(valid, np.uint8)
        inten = None
        ic = 0
        if intensity is not None and ncol > 4:
            inten = np.ascontiguousarray(intensity)
            if inten.dtype not in (np.float32, np.float64):
                inten = inten.astype(np.float64)
            ic = dt[inten.dtype]
        lib.mimosa_pack_scan(
            _cptr(points, ctypes.c_float), ctypes.c_int32(dt[points.dtype]),
            _cptr(t_rel, ctypes.c_float), ctypes.c_int32(dt[t_rel.dtype]),
            _cptr(vd, ctypes.c_uint8) if vd is not None else None,
            _cptr(inten, ctypes.c_float) if inten is not None else None,
            ctypes.c_int32(ic), ctypes.c_int64(n_in), ctypes.c_int64(skip),
            ctypes.c_int64(n_out), ctypes.c_int32(ncol),
            ctypes.c_double(pos_res), ctypes.c_double(t_res),
            ctypes.c_double(int_res), ctypes.c_int32(1 if dither else 0),
            _cptr(out, ctypes.c_int16), ctypes.byref(t_end))
        return out, float(t_end.value)

    # numpy fallback (same semantics; f64 math + multiply-by-reciprocal
    # quantization to stay bit-identical with the C++ — see pack_range)
    inv_pos, inv_t = 1.0 / pos_res, 1.0 / t_res
    inv_int = 1.0 / int_res if int_res > 0 else 0.0
    finite = np.isfinite(points).all(-1)
    ok = (finite if valid is None else (np.asarray(valid, bool) & finite)) \
        & np.isfinite(t_rel)
    t_end = float(t_rel[ok].max()) if ok.any() else 0.0
    pts_s, t_s, ok_s = points[::skip], t_rel[::skip], ok[::skip]
    k = min(len(pts_s), n_out)
    if out is None:
        out = np.zeros((n_out, ncol), np.int16)
    else:
        out[:] = 0
    out[:, 3] = -32768
    p = np.nan_to_num(pts_s[:k].astype(np.float64), posinf=0.0,
                      neginf=0.0)
    q = p * inv_pos
    if dither:
        lane = np.arange(k, dtype=np.uint64)   # packed row index
        q = q + np.stack([_dither01(lane, s) for s in _DITHER_SALTS],
                         axis=-1)
    out[:k, :3] = np.where(ok_s[:k, None],
                           np.clip(np.round(q), -32767, 32767),
                           0).astype(np.int16)
    t_fin = np.nan_to_num(t_s[:k].astype(np.float64), posinf=0.0,
                          neginf=0.0)
    tq = np.clip(np.round(t_fin * inv_t), 0, 65534) - 32767
    out[:k, 3] = np.where(ok_s[:k], tq, -32768).astype(np.int16)
    if ncol > 4:
        iv = np.zeros(n_in) if intensity is None else \
            np.nan_to_num(np.asarray(intensity, np.float64))
        iq = np.clip(np.round(iv[::skip][:k] * inv_int), 0, 32767)
        out[:k, 4] = np.where(ok_s[:k], iq, 0).astype(np.int16)
    return out, t_end


def pack_range(points, t_rel, valid, intensity, skip, n_out, ncol,
               r_res, t_res, int_res, dither=True, out=None, beam=None):
    """Fused sensor-native range-image pack (the range_transfer codec):
    point-skip + pad/truncate + int16 quantization of (range, t[,
    intensity]) rows, range computed in f64 in the same pass — |p| for a
    pure-radial beam model, or s = dot(p - offset, dir) when ``beam`` (f32
    [n_out, 6]: unit dir xyz + per-lane offset xyz, PACKED-lane indexed)
    carries the affine Ouster reconstruction model p = s*dir + offset
    (lidar_origin_to_beam_origin — config/loader.py ouster_ray_dirs).
    Sentinel t == -32768 marks invalid lanes; subtractive per-lane range
    dither uses the x-axis salt. Returns (out int16 [n_out, ncol], t_end)
    with t_end the max t over valid finite lanes of the FULL-density
    input. The numpy fallback is bit-identical (same
    multiply-by-reciprocal quantization expressions as the C++ —
    tests/test_native.py::test_pack_range_numpy_parity pins it; a 1-ULP
    rounding-boundary flip can decide convergence on marginal scenes)."""
    points = np.ascontiguousarray(points)
    t_rel = np.ascontiguousarray(t_rel)
    if points.dtype not in (np.float32, np.float64):
        points = points.astype(np.float64)
    if t_rel.dtype not in (np.float32, np.float64):
        t_rel = t_rel.astype(np.float64)
    n_in = len(points)
    if out is not None:
        assert out.dtype == np.int16 and out.shape == (n_out, ncol) \
            and out.flags.c_contiguous
    lib = get_lib()
    if lib is not None:
        dt = {np.dtype(np.float32): 7, np.dtype(np.float64): 8}
        if out is None:
            out = np.empty((n_out, ncol), np.int16)
        t_end = ctypes.c_double(0.0)
        vd = None
        if valid is not None:
            vd = np.ascontiguousarray(valid, np.uint8)
        inten = None
        ic = 0
        if intensity is not None and ncol > 2:
            inten = np.ascontiguousarray(intensity)
            if inten.dtype not in (np.float32, np.float64):
                inten = inten.astype(np.float64)
            ic = dt[inten.dtype]
        bm = None
        if beam is not None:
            bm = np.ascontiguousarray(beam, np.float32)
            assert bm.shape == (n_out, 6)
        lib.mimosa_pack_range(
            _cptr(points, ctypes.c_float), ctypes.c_int32(dt[points.dtype]),
            _cptr(t_rel, ctypes.c_float), ctypes.c_int32(dt[t_rel.dtype]),
            _cptr(vd, ctypes.c_uint8) if vd is not None else None,
            _cptr(inten, ctypes.c_float) if inten is not None else None,
            ctypes.c_int32(ic),
            _cptr(bm, ctypes.c_float) if bm is not None else None,
            ctypes.c_int64(n_in), ctypes.c_int64(skip),
            ctypes.c_int64(n_out), ctypes.c_int32(ncol),
            ctypes.c_double(r_res), ctypes.c_double(t_res),
            ctypes.c_double(int_res), ctypes.c_int32(1 if dither else 0),
            _cptr(out, ctypes.c_int16), ctypes.byref(t_end))
        return out, float(t_end.value)

    # numpy fallback (same semantics incl. f64 range math; quantization
    # uses the SAME multiply-by-reciprocal expressions as the C++ — a
    # divide can differ by 1 ULP at rounding boundaries, and one LSB flip
    # decides convergence on marginal scenes)
    inv_r, inv_t = 1.0 / r_res, 1.0 / t_res
    inv_int = 1.0 / int_res if int_res > 0 else 0.0
    finite = np.isfinite(points).all(-1)
    ok = (finite if valid is None else (np.asarray(valid, bool) & finite)) \
        & np.isfinite(t_rel)
    t_end = float(t_rel[ok].max()) if ok.any() else 0.0
    pts_s, t_s, ok_s = points[::skip], t_rel[::skip], ok[::skip]
    k = min(len(pts_s), n_out)
    if out is None:
        out = np.zeros((n_out, ncol), np.int16)
    else:
        out[:] = 0
    out[:, 1] = -32768
    p = np.nan_to_num(pts_s[:k].astype(np.float64), posinf=0.0,
                      neginf=0.0)
    if beam is not None:
        bm = np.ascontiguousarray(beam, np.float32).astype(np.float64)
        r = np.einsum("ij,ij->i", p - bm[:k, 3:6], bm[:k, 0:3])
    else:
        r = np.sqrt(np.einsum("ij,ij->i", p, p))
    qr = r * inv_r
    if dither:
        qr = qr + _dither01(np.arange(k, dtype=np.uint64),
                            _DITHER_SALTS[0])
    qr = np.clip(np.round(qr), 0, 65534) - 32767
    out[:k, 0] = np.where(ok_s[:k], qr, 0).astype(np.int16)
    t_fin = np.nan_to_num(t_s[:k].astype(np.float64), posinf=0.0,
                          neginf=0.0)
    tq = np.clip(np.round(t_fin * inv_t), 0, 65534) - 32767
    out[:k, 1] = np.where(ok_s[:k], tq, -32768).astype(np.int16)
    if ncol > 2:
        iv = np.zeros(n_in) if intensity is None else \
            np.nan_to_num(np.asarray(intensity, np.float64))
        iq = np.clip(np.round(iv[::skip][:k] * inv_int), 0, 32767)
        out[:k, 2] = np.where(ok_s[:k], iq, 0).astype(np.int16)
    return out, t_end
