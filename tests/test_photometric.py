import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mimosa_tpu.core import lie
from mimosa_tpu.lidar import photometric as ph

CFG = ph.PhotometricConfig(rows=32, cols=256, range_min=0.5, range_max=50.0,
                           gradient_threshold=2.0, nma_radius=3,
                           num_features=40, margin=4,
                           filter_brightness=False, remove_lines=False,
                           gaussian_blur=False, intensity_scale=1.0)


def textured_scene(seed=0, n=120000):
    """Points on two textured walls, in lidar frame at the origin."""
    rng = np.random.default_rng(seed)
    # four textured walls surrounding the sensor
    pts = []
    for axis, val in [(0, 6.0), (1, 5.0), (0, -6.0), (1, -5.0)]:
        p = rng.uniform(-7, 7, size=(n // 4, 3))
        p[:, 2] = rng.uniform(-2.5, 2.5, size=n // 4)
        p[:, axis] = val
        pts.append(p)
    pts = np.concatenate(pts)
    # intensity: smooth blobby texture over space
    inten = (120 + 60 * np.sin(2.0 * pts[:, 0]) * np.cos(1.5 * pts[:, 1])
             + 40 * np.sin(3.0 * pts[:, 2]))
    return jnp.asarray(pts), jnp.asarray(np.clip(inten, 0, 255))


def test_project_backproject_roundtrip():
    pts, _ = textured_scene(1, 2000)
    u, v, rng, fov = ph.project(pts, CFG)
    back = ph.backproject(u, v, rng, CFG)
    ok = np.asarray(fov)
    err = np.linalg.norm(np.asarray(back - pts), axis=-1)[ok]
    assert np.median(err) < 0.15  # row quantization within a beam spacing


def test_build_images():
    pts, inten = textured_scene(2)
    iimg, rimg = ph.build_images(pts, inten, jnp.ones(len(pts), bool), CFG)
    filled = float(jnp.mean((rimg > 0).astype(jnp.float32)))
    assert filled > 0.3
    assert float(jnp.max(iimg)) <= 255.0
    # ranges are plausible (walls at 5-8 m)
    r = np.asarray(rimg)
    assert 4.0 < np.median(r[r > 0]) < 12.0


def test_psi_properties():
    patch = jnp.asarray(np.random.default_rng(3).uniform(0, 255, size=(7, 25)))
    psi = ph.get_psi(patch)
    np.testing.assert_allclose(jnp.sum(psi, axis=-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(jnp.linalg.norm(psi, axis=-1), 1.0, atol=1e-5)
    # affine intensity invariance: psi(a*I + b) == psi(I)
    psi2 = ph.get_psi(patch * 3.7 + 55.0)
    np.testing.assert_allclose(psi, psi2, atol=1e-5)


def test_normalization_chain_runs():
    pts, inten = textured_scene(4)
    cfg = ph.PhotometricConfig(rows=32, cols=256, intensity_scale=0.5)
    iimg, rimg = ph.build_images(pts, inten, jnp.ones(len(pts), bool), cfg)
    out = ph.normalize_intensity(iimg, rimg > 0, cfg)
    assert out.shape == (32, 256)
    assert float(jnp.max(out)) <= 255.0
    assert not bool(jnp.any(jnp.isnan(out)))


def test_erode_shrinks_mask():
    m = jnp.zeros((32, 64), bool).at[10:20, 10:30].set(True)
    e = ph.erode(m, 2)
    assert int(jnp.sum(e)) < int(jnp.sum(m))
    assert bool(e[15, 20])
    assert not bool(e[10, 10])


def test_detect_and_track():
    pts, inten = textured_scene(5)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    feats = ph.empty_features(CFG)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, feats, q, t, CFG)
    n = int(jnp.sum(feats.valid))
    assert n > 10, n
    # residual ~0 at the true pose
    res = ph.linearize(frame, feats, q, t, CFG)
    assert int(res.num_tracked) > 0.7 * n
    assert float(jnp.linalg.norm(res.b)) < 1e-3 * max(
        float(jnp.linalg.norm(res.H)), 1.0)


def test_photometric_pulls_pose_back():
    """Perturb the pose; GN on the photometric factor alone must reduce
    the error (features live in world frame, frame is at identity)."""
    pts, inten = textured_scene(6)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    feats = ph.empty_features(CFG)
    q_true = lie.quat_identity(jnp.float32)
    t_true = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, feats, q_true, t_true, CFG)

    q = lie.quat_mul(q_true, lie.exp_so3(
        jnp.asarray([0.0, 0.0, 0.01], jnp.float32)))
    t = t_true + jnp.asarray([0.03, -0.02, 0.01], jnp.float32)
    err0 = float(jnp.linalg.norm(t - t_true)) + float(jnp.linalg.norm(
        lie.log_so3(lie.quat_mul(lie.quat_conj(q_true), q))))
    for _ in range(8):
        res = ph.linearize(frame, feats, q, t, CFG)
        dx = -jnp.linalg.solve(res.H + jnp.eye(6) * 1e-2, res.b)
        q, t = lie.se3_retract(q, t, dx)
    err1 = float(jnp.linalg.norm(t - t_true)) + float(jnp.linalg.norm(
        lie.log_so3(lie.quat_mul(lie.quat_conj(q_true), q))))
    assert err1 < 0.5 * err0, (err0, err1)


def test_lifecycle():
    feats = ph.empty_features(CFG)
    feats = feats._replace(valid=feats.valid.at[:5].set(True),
                           life=feats.life.at[:5].set(3))
    tracked = jnp.zeros(CFG.num_features, bool).at[:3].set(True)
    out = ph.update_lifecycle(feats, tracked, CFG)
    assert int(jnp.sum(out.valid)) == 3
    # expiry
    feats2 = feats._replace(life=feats.life.at[0].set(CFG.max_feature_life))
    out2 = ph.update_lifecycle(feats2, jnp.ones(CFG.num_features, bool), CFG)
    assert not bool(out2.valid[0])


def test_degeneracy_aware_detection():
    """With a degenerate direction given, detection prefers candidates whose
    gradients constrain it (ref photometric.cpp:566-644 scoring)."""
    pts, inten = textured_scene(9)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    # a tight budget so ranking order is visible
    import dataclasses as _dc
    cfg_small = _dc.replace(CFG, num_features=8)
    # degenerate along lidar x
    dirs = jnp.eye(3, dtype=jnp.float32)
    mask = jnp.asarray([True, False, False])
    f_deg = ph.detect_features(frame, ph.empty_features(cfg_small), q, t,
                               cfg_small, degen_dirs=(dirs, mask))
    f_plain = ph.detect_features(frame, ph.empty_features(cfg_small), q, t,
                                 cfg_small)
    n_deg = int(jnp.sum(f_deg.valid))
    n_plain = int(jnp.sum(f_plain.valid))
    assert n_deg >= 6 and n_plain >= 6
    # selections must differ (the boost reorders the ranking)
    c_deg = np.asarray(f_deg.center_w[f_deg.valid])
    c_plain = np.asarray(f_plain.center_w[f_plain.valid])
    same = 0
    for c in c_deg:
        if np.min(np.linalg.norm(c_plain - c, axis=-1)) < 1e-6:
            same += 1
    assert same < n_deg  # not identical sets


def test_patch_validity_gates():
    """Detection patch 3D validity (ref photometric.cpp:700-725): an
    impossible compactness bound rejects every candidate; the default
    accepts plenty on planar walls."""
    import dataclasses
    pts, inten = textured_scene(11)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats_ok = ph.detect_features(frame, ph.empty_features(CFG), q, t, CFG)
    assert int(jnp.sum(feats_ok.valid)) > 10
    tight = dataclasses.replace(CFG, max_dist_from_mean=1e-4)
    feats_no = ph.detect_features(frame, ph.empty_features(tight), q, t,
                                  tight)
    assert int(jnp.sum(feats_no.valid)) == 0
    # plane-distance gate alone also bites when impossible
    flat = dataclasses.replace(CFG, max_dist_from_plane=1e-6)
    feats_fl = ph.detect_features(frame, ph.empty_features(flat), q, t, flat)
    assert int(jnp.sum(feats_fl.valid)) < int(jnp.sum(feats_ok.valid))


def test_detection_avoids_tracked_features():
    """Re-detection suppresses candidates within nma_radius of live
    features (ref photometric.cpp:524-530 circle masking)."""
    pts, inten = textured_scene(12)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, ph.empty_features(CFG), q, t, CFG)
    keep = np.zeros(CFG.num_features, bool)
    keep[:8] = np.asarray(feats.valid)[:8]
    feats = feats._replace(valid=jnp.asarray(keep),
                           life=jnp.where(jnp.asarray(keep), feats.life, -1))
    refilled = ph.detect_features(frame, feats, q, t, CFG)
    old = np.asarray(feats.valid)
    new = np.asarray(refilled.valid) & ~old
    if not new.any():
        return  # nothing refilled on this texture — nothing to check
    u_all, v_all, _, _ = ph.project(refilled.center_w, CFG)
    u_all, v_all = np.asarray(u_all), np.asarray(v_all)
    for i in np.where(new)[0]:
        for j in np.where(old)[0]:
            cheb = max(abs(u_all[i] - u_all[j]), abs(v_all[i] - v_all[j]))
            assert cheb > CFG.nma_radius - 1.5, (i, j, cheb)


def test_gemanmcclure_downweights_outliers():
    """GM weight (ref photometric_factor.hpp:309-315) suppresses large
    residuals harder than no-robust."""
    import dataclasses
    pts, inten = textured_scene(13)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, ph.empty_features(CFG), q, t, CFG)
    # perturb the pose so residuals are nonzero but still tracked
    dq = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.004], jnp.float32))
    q2 = lie.quat_mul(q, dq)
    cfg_none = dataclasses.replace(CFG, use_robust=False)
    cfg_gm = dataclasses.replace(CFG, robust="gemanmcclure",
                                 huber_delta=0.2)
    r_none = ph.linearize(frame, feats, q2, t, cfg_none)
    r_gm = ph.linearize(frame, feats, q2, t, cfg_gm)
    assert int(r_gm.num_tracked) > 0
    assert float(jnp.trace(r_gm.H)) < float(jnp.trace(r_none.H))


def test_static_mask_blocks_regions():
    """Static mask zeros (ref createMask) exclude pixels from the frame
    mask and therefore from detection."""
    pts, inten = textured_scene(14)
    smask = np.ones((CFG.rows, CFG.cols), bool)
    smask[:, : CFG.cols // 2] = False
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), CFG,
                          static_mask=jnp.asarray(smask))
    assert not bool(frame.mask[:, : CFG.cols // 2].any())
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, ph.empty_features(CFG), q, t, CFG)
    u, v, _, _ = ph.project(feats.center_w, CFG)
    v = np.asarray(v)[np.asarray(feats.valid)]
    assert (v >= CFG.cols // 2 - 1).all()


def test_patch_layout_and_rotation():
    """Edgelet machinery (ref photometric_config.hpp:62-67,
    photometric_utils.cpp:485-518): explicit (x=col, y=row) offsets map to
    (dr, dc); rotate_offsets applies T = [normal tangent] in image coords."""
    # explicit pattern: a plus shape, pairs are (x=col, y=row)
    cfg = dataclasses.replace(
        CFG, patch_offsets=((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)))
    dr, dc, ci = ph.patch_layout(cfg)
    assert ph.n_patch_points(cfg) == 5
    np.testing.assert_array_equal(dr, [0, 0, 0, 1, -1])
    np.testing.assert_array_equal(dc, [0, 1, -1, 0, 0])
    assert ci == 0
    # default layout: the full square, center sample at the middle
    dr5, dc5, ci5 = ph.patch_layout(CFG)
    assert len(dr5) == 25 and dr5[ci5] == 0 and dc5[ci5] == 0

    # gradient purely along columns (vertical edge): normal=(0,1),
    # tangent=(1,0) in (x,y) -> r_x = y, r_y = x (pattern transposed)
    dr_j = jnp.asarray(dr)
    dc_j = jnp.asarray(dc)
    r_r, r_c = ph.rotate_offsets(jnp.asarray(1.0), jnp.asarray(0.0),
                                 dr_j, dc_j)
    np.testing.assert_allclose(np.asarray(r_c), dr, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_r), dc, atol=1e-5)
    # gradient along rows: normal=(-1,0), tangent=(0,1) -> r_x=-x, r_y=y
    r_r, r_c = ph.rotate_offsets(jnp.asarray(0.0), jnp.asarray(1.0),
                                 dr_j, dc_j)
    np.testing.assert_allclose(np.asarray(r_c), -np.asarray(dc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_r), dr, atol=1e-5)
    # any gradient: a rotation preserves pairwise distances
    r_r, r_c = ph.rotate_offsets(jnp.asarray(0.6), jnp.asarray(-1.3),
                                 dr_j, dc_j)
    d0 = np.hypot(dr[:, None] - dr[None], dc[:, None] - dc[None])
    d1 = np.hypot(np.asarray(r_r)[:, None] - np.asarray(r_r)[None],
                  np.asarray(r_c)[:, None] - np.asarray(r_c)[None])
    np.testing.assert_allclose(d1, d0, atol=1e-4)


def test_detect_with_rotated_patches():
    """rotate_patch_to_align_with_gradient end-to-end: detection fills the
    store and the factor still tracks and pulls a perturbed pose back."""
    cfg = dataclasses.replace(CFG, rotate_patch=True)
    pts, inten = textured_scene(15)
    frame = ph.make_frame(pts, inten, jnp.ones(len(pts), bool), cfg)
    q = lie.quat_identity(jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    feats = ph.detect_features(frame, ph.empty_features(cfg), q, t, cfg)
    n = int(jnp.sum(feats.valid))
    assert n > 10, n
    res = ph.linearize(frame, feats, q, t, cfg)
    assert int(res.num_tracked) > 0.7 * n
    # perturbed pose: GN must reduce the error
    q2 = lie.quat_mul(q, lie.exp_so3(jnp.asarray([0.0, 0.0, 0.008],
                                                 jnp.float32)))
    t2 = t + jnp.asarray([0.02, -0.015, 0.01], jnp.float32)
    err0 = float(jnp.linalg.norm(t2 - t))
    for _ in range(8):
        r = ph.linearize(frame, feats, q2, t2, cfg)
        dx = -jnp.linalg.solve(r.H + jnp.eye(6) * 1e-2, r.b)
        q2, t2 = lie.se3_retract(q2, t2, dx)
    assert float(jnp.linalg.norm(t2 - t)) < 0.5 * err0
