"""Synthetic LiDAR+IMU dataset generator for end-to-end replay tests.

Plays the role of the reference's rosbag datasets for CI: an analytic
trajectory through a structured world of finite planes, raycast into
motion-skewed spinning-LiDAR scans plus ideal (optionally noisy/biased)
IMU. Ground truth is exact, so replay ATE is a true integration test of
deskew + ICP + preintegration + window solver together (the reference's
"dataset-replay as the integration test" strategy, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mimosa_tpu.core import lie


def _on_cpu(fn):
    """Pin a generator to the host CPU backend.

    Synthetic data generation is host-side tooling, not the estimator: on
    the tunneled TPU its small jit/eager ops not only waste ~25 ms RPCs
    each, they permanently downgrade the relay session from streamed
    dispatch (~0.2 ms/program) to per-program round-trips (~25 ms/program)
    for the REST of the process — measured in
    scripts/probe_poison_bisect.py (modes gen vs gencpu). Every consumer
    of this module runs in the same process as the estimator, so keep all
    generation off the accelerator."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        try:
            # local_devices, not devices: under a multi-process mesh
            # (jax.distributed) the global device list starts with process
            # 0's devices — pinning generation there from another process
            # closes jit constants over non-addressable arrays and aborts
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return fn(*a, **k)
        with jax.default_device(cpu):
            return fn(*a, **k)
    return wrapped


@dataclasses.dataclass
class Rect:
    """Finite rectangle: origin o, edges e1, e2 (not necessarily unit)."""

    o: np.ndarray
    e1: np.ndarray
    e2: np.ndarray

    @property
    def normal(self):
        n = np.cross(self.e1, self.e2)
        return n / np.linalg.norm(n)


def room_world(lx=16.0, ly=8.0, lz=4.0):
    """A room with two interior partial walls — fully 6-dof observable."""
    def r(o, e1, e2):
        return Rect(np.asarray(o, float), np.asarray(e1, float),
                    np.asarray(e2, float))
    return [
        r([0, 0, 0], [lx, 0, 0], [0, ly, 0]),          # floor
        r([0, 0, lz], [lx, 0, 0], [0, ly, 0]),         # ceiling
        r([0, 0, 0], [lx, 0, 0], [0, 0, lz]),          # wall y=0
        r([0, ly, 0], [lx, 0, 0], [0, 0, lz]),         # wall y=ly
        r([0, 0, 0], [0, ly, 0], [0, 0, lz]),          # wall x=0
        r([lx, 0, 0], [0, ly, 0], [0, 0, lz]),         # wall x=lx
        r([lx * 0.4, 0, 0], [0, ly * 0.55, 0], [0, 0, lz * 0.8]),  # partition
        r([lx * 0.7, ly, 0], [0, -ly * 0.5, 0], [0, 0, lz * 0.7]),  # partition
    ]


def corridor_world(length=80.0, w=4.0, h=3.0):
    """An 'infinite' corridor (no end caps visible within lidar range):
    translation along x is geometrically unobservable from planes — only
    the world-anchored intensity texture pins it. The synthetic stand-in
    for the tunnel/corridor scenes PG-LIO targets (ENWIDE tunnel_*)."""
    def r(o, e1, e2):
        return Rect(np.asarray(o, float), np.asarray(e1, float),
                    np.asarray(e2, float))
    return [
        r([0, 0, 0], [length, 0, 0], [0, w, 0]),       # floor
        r([0, 0, h], [length, 0, 0], [0, w, 0]),       # ceiling
        r([0, 0, 0], [length, 0, 0], [0, 0, h]),       # wall y=0
        r([0, w, 0], [length, 0, 0], [0, 0, h]),       # wall y=w
    ]


def raycast(world, origins, dirs, max_range=60.0):
    """Vectorized ray-rectangle intersection. origins/dirs [N,3] -> ranges [N]
    (inf where no hit)."""
    n = origins.shape[0]
    best = np.full(n, np.inf)
    for rect in world:
        nrm = rect.normal
        denom = dirs @ nrm
        with np.errstate(divide="ignore", invalid="ignore"):
            # rays parallel to the plane produce inf/NaN here by design;
            # the ok mask below discards them
            t = ((rect.o - origins) @ nrm) / denom
            hit = origins + t[:, None] * dirs
            rel = hit - rect.o
            a = rel @ rect.e1 / (rect.e1 @ rect.e1)
            b = rel @ rect.e2 / (rect.e2 @ rect.e2)
        with np.errstate(invalid="ignore"):
            ok = (np.abs(denom) > 1e-9) & (t > 0.05) & (t < max_range) & \
                 (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
        best = np.where(ok & (t < best), t, best)
    return best


@dataclasses.dataclass
class TrajectoryConfig:
    t_total: float = 12.0
    t_stationary: float = 1.2   # initial stillness for attitude init
    amp: tuple = (3.0, 1.6, 0.4)
    freq: tuple = (0.10, 0.16, 0.23)
    yaw_rate: float = 0.35
    center: tuple = (6.0, 4.0, 1.5)


@_on_cpu
def make_trajectory(tc: TrajectoryConfig):
    """Returns jax-callable pose/vel/imu functions of scalar time."""
    amp = jnp.asarray(tc.amp)
    frq = jnp.asarray(tc.freq)
    ctr = jnp.asarray(tc.center)
    t0 = tc.t_stationary

    def ramp(t):
        # C2 smoothstep from 0 at t0 to (t - t0) slope 1 afterwards
        s = jnp.clip((t - t0) / 2.0, 0.0, 1.0)
        w = s * s * (3.0 - 2.0 * s)
        return jnp.where(t <= t0, 0.0, (t - t0) * w)

    def pos(t):
        u = ramp(t)
        return ctr + amp * jnp.sin(2 * jnp.pi * frq * u)

    def yaw(t):
        return tc.yaw_rate * ramp(t)

    def quat(t):
        return lie.exp_so3(jnp.stack([0.0 * t, 0.0 * t, yaw(t)]))

    vel = jax.jacfwd(pos)
    acc = jax.jacfwd(vel)
    yaw_dot = jax.grad(yaw)

    def imu(t, g_mag=9.81):
        """(specific force in body, body rates)."""
        g_w = jnp.asarray([0.0, 0.0, -g_mag])
        R = lie.quat_to_mat(quat(t))
        f_b = R.T @ (acc(t) - g_w)
        w_b = R.T @ jnp.asarray([0.0, 0.0, yaw_dot(t)])
        return f_b, w_b

    return dict(pos=pos, vel=vel, acc=acc, quat=quat, imu=imu)


@dataclasses.dataclass
class LidarModel:
    n_rows: int = 16
    n_cols: int = 256
    fov_up: float = 0.30        # rad
    fov_down: float = -0.45
    period: float = 0.1         # s per scan
    max_range: float = 60.0


def beam_dirs(lm: LidarModel):
    alt = np.linspace(lm.fov_down, lm.fov_up, lm.n_rows)
    az = np.linspace(0, 2 * np.pi, lm.n_cols, endpoint=False)
    A, Z = np.meshgrid(az, alt)  # [rows, cols]
    d = np.stack([np.cos(Z) * np.cos(A), np.cos(Z) * np.sin(A), np.sin(Z)],
                 axis=-1)
    return d.reshape(-1, 3), np.broadcast_to(
        az[None, :], (lm.n_rows, lm.n_cols)).reshape(-1)


@_on_cpu
def generate(world, tc: TrajectoryConfig, lm: LidarModel,
             imu_rate=200, seed=0, imu_noise=0.0, imu_bias=None,
             range_noise=0.0):
    """Produce the full event stream: sorted (kind, payload) events.

    Returns dict with 'imu' (ts, acc, gyro arrays), 'scans' (list of dicts
    with ts_header, points [N,3] lidar frame, t_rel [N], valid [N]),
    'gt' (ts, pos, quat arrays at scan ends).
    """
    rng = np.random.default_rng(seed)
    traj = make_trajectory(tc)
    bg, ba = (np.zeros(3), np.zeros(3)) if imu_bias is None else imu_bias

    # IMU stream
    imu_ts = np.arange(0.0, tc.t_total, 1.0 / imu_rate)
    f_imu = jax.jit(jax.vmap(lambda t: traj["imu"](t)))
    accs, gyros = f_imu(jnp.asarray(imu_ts))
    accs = np.asarray(accs) + ba + rng.normal(
        size=(len(imu_ts), 3)) * imu_noise
    gyros = np.asarray(gyros) + bg + rng.normal(
        size=(len(imu_ts), 3)) * imu_noise * 0.1

    # scans: column c fired at ts_header + c/cols*period from the pose at
    # that time — real rolling-shutter skew
    dirs, az = beam_dirs(lm)
    col_of_beam = (az / (2 * np.pi) * lm.n_cols).astype(int) % lm.n_cols
    t_rel_beam = col_of_beam / lm.n_cols * lm.period

    f_pose = jax.jit(jax.vmap(lambda t: (traj["quat"](t), traj["pos"](t))))
    scans = []
    gt_ts, gt_p, gt_q = [], [], []
    scan_starts = np.arange(tc.t_stationary - 0.2, tc.t_total - lm.period,
                            lm.period)
    for ts0 in scan_starts:
        col_ts = ts0 + np.arange(lm.n_cols) / lm.n_cols * lm.period
        qs, ps = f_pose(jnp.asarray(col_ts))
        qs, ps = np.asarray(qs), np.asarray(ps)
        Rb = np.asarray(lie.quat_to_mat(jnp.asarray(qs)))  # [C,3,3]
        R_beam = Rb[col_of_beam]
        o_beam = ps[col_of_beam]
        d_world = np.einsum("nij,nj->ni", R_beam, dirs)
        rr = raycast(world, o_beam, d_world, lm.max_range)
        if range_noise:
            rr = rr + rng.normal(size=rr.shape) * range_noise
        valid = np.isfinite(rr)
        pts_lidar = dirs * np.where(valid, rr, 0.0)[:, None]
        # world-anchored intensity texture (photometric pipeline input)
        hit_w = o_beam + d_world * np.where(valid, rr, 0.0)[:, None]
        inten = np.where(valid, 120.0 + 60.0 * np.sin(1.3 * hit_w[:, 0])
                         * np.cos(0.9 * hit_w[:, 1])
                         + 40.0 * np.sin(1.7 * hit_w[:, 2]), 0.0)
        scans.append(dict(ts_header=ts0, points=pts_lidar.astype(np.float32),
                          t_rel=t_rel_beam.copy(), valid=valid,
                          intensity=np.clip(inten, 0, 255).astype(
                              np.float32)))
        t_end = ts0 + t_rel_beam.max()
        qe, pe = f_pose(jnp.asarray([t_end]))
        gt_ts.append(t_end)
        gt_p.append(np.asarray(pe[0]))
        gt_q.append(np.asarray(qe[0]))

    return dict(
        imu=dict(ts=imu_ts, acc=accs, gyro=gyros),
        scans=scans,
        gt=dict(ts=np.asarray(gt_ts), pos=np.asarray(gt_p),
                quat=np.asarray(gt_q)),
    )


@_on_cpu
def generate_ouster(world, tc: TrajectoryConfig, beam_altitudes,
                    pixel_shift_by_row, n_cols=256, period=0.1,
                    max_range=60.0, imu_rate=200, seed=0,
                    imu_noise=0.0, range_noise=0.0, tex_amp=110.0,
                    beam_azimuths=None, beam_offset_m=0.0):
    """Staggered Ouster-format scans: points in sensor pixel-id order
    (row-major, staggered column fastest), measurement block c fired at
    ts_header + c/cols*period, per-row destagger shifts — the raw layout
    the reference's PBID fill + yaw table consume (photometric.cpp:72-243).
    Row v of block c samples the azimuth of destaggered column
    (c + shift[v]) % cols, or the EXACT per-beam azimuth offset when
    ``beam_azimuths`` (radians, length rows) is given; a nonzero
    ``beam_offset_m`` emulates the full affine Ouster driver model
    p = s*dir + n*enc (lidar_origin_to_beam_origin — beams fire from a
    ring of radius n around the encoder axis; Ouster Sensor Docs /
    os_*.json beam_intrinsics), which is what
    config.loader.ouster_ray_dirs inverts for the range_transfer codec.
    Returns the same structure as :func:`generate` plus per-scan
    ``ring``; points are the sensor-frame returns AT FIRING TIME
    (motion-skewed)."""
    rng_np = np.random.default_rng(seed)
    traj = make_trajectory(tc)
    rows = len(beam_altitudes)
    alt = np.asarray(beam_altitudes)
    shifts = np.asarray(pixel_shift_by_row, int)

    imu_ts = np.arange(0.0, tc.t_total, 1.0 / imu_rate)
    f_imu = jax.jit(jax.vmap(lambda t: traj["imu"](t)))
    accs, gyros = f_imu(jnp.asarray(imu_ts))
    accs = np.asarray(accs) + rng_np.normal(size=(len(imu_ts), 3)) \
        * imu_noise
    gyros = np.asarray(gyros) + rng_np.normal(size=(len(imu_ts), 3)) \
        * imu_noise * 0.1

    v, c = np.meshgrid(np.arange(rows), np.arange(n_cols), indexing="ij")
    # encoder angle, Ouster driver convention (2*pi*(1 - c/N) — matches
    # config.loader.ouster_ray_dirs so the range-codec beam table agrees
    # with this cloud without any yaw compensation)
    az_enc = 2.0 * np.pi * (1.0 - c / n_cols)
    if beam_azimuths is not None:
        az_s = az_enc - np.asarray(beam_azimuths)[:, None] \
            * np.ones_like(az_enc)
    else:
        u_dest = (c + shifts[:, None]) % n_cols
        az_s = 2.0 * np.pi * (1.0 - u_dest / n_cols)  # shift-quantized
    t_rel = (c / n_cols * period).reshape(-1)
    ca, sa = np.cos(az_s), np.sin(az_s)
    cal = np.cos(alt)[:, None] * np.ones_like(ca)
    sal = np.sin(alt)[:, None] * np.ones_like(ca)
    dirs = np.stack([cal * ca, cal * sa, sal], -1).reshape(-1, 3)
    # beam origin offset in the sensor frame: each beam fires from
    # n * enc (a ring of radius n around the encoder axis), and the
    # driver reports p = s*dir + n*enc with s the beam-origin range
    beam_orig = beam_offset_m * np.stack(
        [np.cos(az_enc), np.sin(az_enc), np.zeros_like(az_enc)],
        -1).reshape(-1, 3) if beam_offset_m else None
    ring = v.reshape(-1).astype(np.uint16)
    block = c.reshape(-1)

    f_pose = jax.jit(jax.vmap(lambda t: (traj["quat"](t), traj["pos"](t))))
    scans, gt_ts, gt_p, gt_q = [], [], [], []
    scan_starts = np.arange(tc.t_stationary - 0.2, tc.t_total - period,
                            period)
    for ts0 in scan_starts:
        col_ts = ts0 + np.arange(n_cols) / n_cols * period
        qs, ps = f_pose(jnp.asarray(col_ts))
        Rb = np.asarray(lie.quat_to_mat(jnp.asarray(qs)))[block]
        o = np.asarray(ps)[block]
        if beam_orig is not None:
            o = o + np.einsum("nij,nj->ni", Rb, beam_orig)
        d_world = np.einsum("nij,nj->ni", Rb, dirs)
        rr = raycast(world, o, d_world, max_range)
        if range_noise:
            rr = rr + rng_np.normal(size=rr.shape) * range_noise
        valid = np.isfinite(rr)
        pts = dirs * np.where(valid, rr, 0.0)[:, None]
        if beam_orig is not None:
            pts = np.where(valid[:, None], pts + beam_orig, 0.0)
        hit_w = o + d_world * np.where(valid, rr, 0.0)[:, None]
        inten = np.where(
            valid,
            130.0 + tex_amp * np.sin(1.3 * hit_w[:, 0])
            * np.cos(0.9 * hit_w[:, 1])
            + 0.6 * tex_amp * np.sin(1.7 * hit_w[:, 2]), 0.0)
        scans.append(dict(ts_header=ts0, points=pts.astype(np.float32),
                          t_rel=t_rel.copy(), valid=valid, ring=ring,
                          intensity=np.clip(inten, 0, 255).astype(
                              np.float32)))
        t_end = ts0 + t_rel.max()
        qe, pe = f_pose(jnp.asarray([t_end]))
        gt_ts.append(t_end)
        gt_p.append(np.asarray(pe[0]))
        gt_q.append(np.asarray(qe[0]))
    return dict(imu=dict(ts=imu_ts, acc=accs, gyro=gyros), scans=scans,
                gt=dict(ts=np.asarray(gt_ts), pos=np.asarray(gt_p),
                        quat=np.asarray(gt_q)))


@_on_cpu
def generate_radar(traj, tc: TrajectoryConfig, rate=20.0, n_targets=96,
                   seed=0, noise=0.02, q_b_r=(1.0, 0, 0, 0),
                   t_b_r=(0.0, 0, 0)):
    """Radar Doppler frames from the analytic trajectory (static world):
    random bearings in the radar frame, radial speed = -(d . v_R)."""
    import jax.numpy as jnp

    from mimosa_tpu.radar import factor as rad

    rng = np.random.default_rng(seed + 100)
    cfg = rad.RadarConfig(q_b_r=tuple(q_b_r), t_b_r=tuple(t_b_r))
    f_state = jax.jit(jax.vmap(lambda t: (
        traj["quat"](t), traj["vel"](t),
        traj["imu"](t)[1])))
    ts = np.arange(tc.t_stationary * 0.5, tc.t_total, 1.0 / rate)
    qs, vs, ws = f_state(jnp.asarray(ts))
    frames = []
    for k, t in enumerate(ts):
        dirs = rng.normal(size=(n_targets, 3))
        dirs[:, 0] = np.abs(dirs[:, 0]) + 0.5
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dop = np.asarray(rad.residuals(
            qs[k], vs[k], jnp.zeros(3), ws[k], jnp.asarray(dirs),
            jnp.zeros(n_targets), cfg))
        dop = dop + rng.normal(size=n_targets) * noise
        ranges = rng.uniform(2.0, 30.0, size=n_targets)
        frames.append(dict(ts=float(t), points=dirs * ranges[:, None],
                           doppler=dop,
                           snr_db=np.full(n_targets, 20.0)))
    return frames


@_on_cpu
def generate_odometry(traj, tc: TrajectoryConfig, rate=10.0, seed=0,
                      noise_rot=0.002, noise_trans=0.005):
    """External odometry poses (identity extrinsics) with incremental noise."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed + 200)
    f_pose = jax.jit(jax.vmap(lambda t: (traj["quat"](t), traj["pos"](t))))
    ts = np.arange(tc.t_stationary * 0.5, tc.t_total, 1.0 / rate)
    qs, ps = f_pose(jnp.asarray(ts))
    msgs = []
    for k, t in enumerate(ts):
        dq = lie.exp_so3(jnp.asarray(rng.normal(size=3) * noise_rot))
        q = np.asarray(lie.quat_mul(jnp.asarray(qs[k]), dq))
        p = np.asarray(ps[k]) + rng.normal(size=3) * noise_trans
        msgs.append(dict(ts=float(t), q=q, t=p,
                         cov=np.eye(6) * 1e-4))
    return msgs


def ate_rmse(est_ts, est_p, gt_ts, gt_p, align=True):
    """APE translation RMSE after optional SE(3) (Umeyama, no scale)
    alignment — the evo metric used by the reference's evaluation
    (ref scripts/dataset_evaluation.py:242-273)."""
    gt_interp = np.stack([np.interp(est_ts, gt_ts, gt_p[:, i])
                          for i in range(3)], axis=-1)
    est = np.asarray(est_p)
    if align and len(est) >= 3:
        mu_e, mu_g = est.mean(0), gt_interp.mean(0)
        E, G = est - mu_e, gt_interp - mu_g
        U, _, Vt = np.linalg.svd(E.T @ G)
        S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R = (U @ S @ Vt).T
        est = (R @ E.T).T + mu_g
        gt_interp = G + mu_g
    err = np.linalg.norm(est - gt_interp, axis=-1)
    return float(np.sqrt((err ** 2).mean()))
