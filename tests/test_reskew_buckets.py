"""Single-point-per-pixel re-skew store vs the reference's per-pixel
multi-return buckets (VERDICT r3 item 7) — measured.

The reference keeps up to DUPLICATE_POINTS=10 deskewed points per
scan-end pixel (photometric_utils.hpp:17,76; fill photometric.cpp:
233-243) and, at re-skew lookup, picks the bucket entry NEAREST IN 3D to
the query point (photometric_utils.cpp:306-333) — so a background
feature whose pixel also catches an occluding foreground point is
re-skewed with the background point's own sampling time. The repo's
``make_frame`` keeps ONE point per pixel under a min-range claim (front
surface wins) with a column-time fallback — a TPU-first simplification.

This test MEASURES the consequence on an occlusion-boundary scene (near
strip in front of a textured cylinder) under aggressive in-scan yaw
(10 rad/s): brute-force per-pixel buckets in numpy, then the
pixel-reprojection delta between the two selection rules for every
point whose pixel's stored transform is not its own.

Measured result (PARITY.md "re-skew buckets"): points can only merge
into one scan-end pixel when their sampling times are within the
azimuth-compression window (~1-2 columns, < 1 ms even at 10 rad/s —
large same-pixel time gaps would need the yaw table itself to fold,
which the bracketed column search resolves locally), so EVERY
disagreement reprojects within 0.2 px — an order below NCC patch
sensitivity. A yaw-reversal + 2 m/s translation scene measures the
same bound (max 0.18 px). Buckets would change nothing for tracked
features; the simplification stands.
"""

import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import deskew as dk
from mimosa_tpu.lidar import photometric as ph

ROWS, COLS = 32, 256
T_SCAN = 0.1
OMEGA = 10.0
ALTS = np.linspace(0.35, -0.35, ROWS)


def _cfg():
    return ph.PhotometricConfig(
        rows=ROWS, cols=COLS, range_min=0.5, range_max=50.0,
        beam_altitudes=tuple(float(a) for a in ALTS),
        gradient_threshold=2.0, nma_radius=3, num_features=48, margin=4,
        filter_brightness=False, remove_lines=False, gaussian_blur=False,
        intensity_scale=1.0, exact_ouster=True,
        pixel_shift_by_row=(0,) * ROWS)


def _make_occlusion_scan(yaw0, omega, near_range=2.2,
                         near_sector=(0.6, 1.6)):
    """Ouster-style scan of a 6 m textured cylinder with a near vertical
    strip occluding world azimuths in ``near_sector`` — the classic
    occlusion boundary, swept across columns by the in-scan yaw."""
    v, c = np.meshgrid(np.arange(ROWS), np.arange(COLS), indexing="ij")
    t = c / COLS * T_SCAN
    az_s = np.pi * (1.0 - 2.0 * c / COLS)
    az_w = az_s + yaw0 + omega * t
    alt = ALTS[:, None] * np.ones_like(t)
    r_far = 6.0 / np.cos(alt)
    aw = np.mod(az_w, 2 * np.pi)
    near = (aw > near_sector[0]) & (aw < near_sector[1])
    rng = np.where(near, near_range / np.cos(alt), r_far)
    z = rng * np.sin(alt)
    inten = np.clip(130 + 70 * np.sin(7.0 * az_w) * np.cos(9.0 * z)
                    + 45 * np.sin(13.0 * az_w + 2.0 * z), 0, 255)
    ca, sa = np.cos(az_s), np.sin(az_s)
    cz = np.cos(alt) * rng
    pts = np.stack([cz * ca, cz * sa, z], -1)
    return (pts.reshape(-1, 3).astype(np.float32),
            t.reshape(-1).astype(np.float32),
            inten.reshape(-1).astype(np.float32),
            near.reshape(-1))


def test_reskew_single_point_store_is_subpixel_vs_bucket_rule():
    cfg = _cfg()
    f32 = jnp.float32
    pts, t_rel, inten, _ = _make_occlusion_scan(0.0, OMEGA)
    valid = np.ones(len(pts), bool)
    m = 16
    imu_ts = jnp.asarray(np.linspace(0.0, T_SCAN, m), f32)
    gyros = jnp.tile(jnp.asarray([[0.0, 0.0, OMEGA]], f32), (m, 1))
    accs = jnp.tile(jnp.asarray([[0.0, 0.0, 9.81]], f32), (m, 1))
    z3 = jnp.zeros(3, f32)
    dsk = dk.deskew(jnp.asarray(pts), jnp.asarray(t_rel),
                    jnp.asarray(valid), lie.quat_identity(f32), z3, z3,
                    accs, gyros, imu_ts, z3, z3,
                    jnp.asarray([0.0, 0.0, -9.81], f32),
                    lie.quat_identity(f32), z3, jnp.asarray(T_SCAN, f32))
    frame = ph.make_frame(dsk.points_le, jnp.asarray(inten),
                          jnp.asarray(valid), cfg,
                          points_raw=jnp.asarray(pts),
                          q_le_lt=dsk.q_le_lt, t_le_lt=dsk.t_le_lt)

    # brute-force per-pixel buckets of deskewed points at their scan-end
    # projection (the reference's proj_idx fill)
    p_le = np.asarray(dsk.points_le)
    q_lt = np.asarray(dsk.q_le_lt)
    t_lt = np.asarray(dsk.t_le_lt)
    u, v, _, okp = map(np.asarray,
                       ph.project_yaw(dsk.points_le, frame.yaw, cfg))
    ui = np.clip(np.round(u).astype(int), 0, ROWS - 1)
    vi = np.clip(np.round(v).astype(int), 0, COLS - 1)
    pix = ui * COLS + vi

    q_rs = np.asarray(frame.q_rs).reshape(-1, 4)
    t_rs = np.asarray(frame.t_rs).reshape(-1, 3)
    rs_ok = np.asarray(frame.rs_ok).reshape(-1)

    buckets = {}
    for j in np.flatnonzero(okp):
        buckets.setdefault(pix[j], []).append(j)

    n_multi = sum(1 for js in buckets.values() if len(js) >= 2)
    n_disagree = 0
    deltas_px = []
    dts = []
    for pxi, js in buckets.items():
        if len(js) < 2 or not rs_ok[pxi]:
            continue
        tj = t_rel[js]
        for j in js:
            # reference rule: nearest-in-3D bucket entry to the query —
            # the query point itself is in the bucket, so its OWN
            # transform wins
            q_ref, t_ref = q_lt[j], t_lt[j]
            if np.allclose(q_ref, q_rs[pxi], atol=1e-7) and \
                    np.allclose(t_ref, t_rs[pxi], atol=1e-7):
                continue
            n_disagree += 1
            p = p_le[j]
            Rr = np.asarray(lie.quat_to_mat(jnp.asarray(q_ref)))
            Ro = np.asarray(lie.quat_to_mat(jnp.asarray(q_rs[pxi])))
            pr = Rr.T @ (p - t_ref)
            po = Ro.T @ (p - t_rs[pxi])
            ur, vr, _, _ = map(np.asarray, ph.project_yaw(
                jnp.asarray(pr[None], f32), frame.yaw, cfg))
            uo, vo, _, _ = map(np.asarray, ph.project_yaw(
                jnp.asarray(po[None], f32), frame.yaw, cfg))
            deltas_px.append(float(np.hypot(ur[0] - uo[0], vr[0] - vo[0])))
            dts.append(float(tj.max() - tj.min()))

    # the scene really does produce multi-return pixels and rule
    # disagreements (otherwise this measures nothing)
    assert n_multi > 20, n_multi
    assert n_disagree > 0, "occlusion scene produced no bucket conflicts"
    # pixel merging implies time adjacency (the compression window):
    # same-pixel sampling times stay within ~2 columns even at 10 rad/s
    assert max(dts) < 3.0 * T_SCAN / COLS, max(dts)
    # ... so every disagreement reprojects sub-pixel: the bucket rule and
    # the min-range store select transforms whose difference is below
    # NCC patch sensitivity — capped buckets would change nothing
    assert max(deltas_px) < 0.5, \
        (n_disagree, float(np.median(deltas_px)), max(deltas_px))
