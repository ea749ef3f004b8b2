"""Build the synthetic benchmark dataset (bags + ground truth + configs).

Produces a dataset directory in the layout scripts/dataset_evaluation.py
consumes — the stand-in for ENWIDE-style datasets in environments without
the real bags (exact ground truth, motion-skewed scans, textured walls,
radar Doppler frames on the corridor sequences):

    <out>/
      params.yaml              synthetic platform config (reference format)
      overrides/li_degen.yaml  + geometric degeneracy projection
      overrides/pgli.yaml      + photometric (PG-LIO) on top
      room_s/ room_d/          bounded room, slow / aggressive motion
      corridor_s/ corridor_d/  straight corridor (the ENWIDE tunnel
                               analogue: translation along the axis is
                               geometrically unobservable) + radar frames

Usage:
    python scripts/make_synthetic_dataset.py --out /root/datasets/syn_v1
    python scripts/dataset_evaluation.py --dataset-dir /root/datasets/syn_v1 \
        --config /root/datasets/syn_v1/params.yaml \
        --imu-topic /imu --lidar-topic /points \
        [--config-override .../overrides/pgli.yaml] [--radar-topic /radar]
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_params(lm):
    """Reference-format params.yaml tuned for the synthetic platform
    (mirrors the gate config of tests/test_bag_replay_cli.py)."""
    return {
        "imu": {"manager": {"pose_init_wait_secs": 0.5},
                "preintegration": {"acc_noise_density": 0.03,
                                   "gyro_noise_density": 0.003,
                                   "gravity_magnitude": 9.81,
                                   "gravity_aligned_initialization": True,
                                   "acc_bias_random_walk": 1e-3,
                                   "gyro_bias_random_walk": 1e-4}},
        "graph": {"manager": {
            "max_measurement_latency": 0.25,
            "smoother": {"lag": 0.5,
                         "additional_update_iterations": 2,
                         "initial_position_sigma": 1e-3,
                         "initial_rotation_pitch_roll_sigma_deg": 0.01}}},
        "lidar": {
            "T_B_S": [0, 0, 0, 0, 0, 0, 1],
            "manager": {"enabled": True, "range_min": 0.2,
                        "range_max": 60.0},
            "geometric": {
                "neighbor_voxel_mode": 19,
                "map_keyframe_trans_thresh": 0.3,
                "map_keyframe_rot_thresh_deg": 8.0,
                "lru_horizon": 0,
                "initial_clouds_to_force_map_update": 5,
                "scan_to_map": {
                    "source_voxel_grid_filter_leaf_size": 0.4,
                    "target_ivox_map_leaf_size": 0.4,
                    "target_ivox_map_min_dist_in_voxel": 0.15,
                    "plane_validity_distance": 0.08,
                    "lidar_point_noise_std_dev": 0.05,
                    "huber_threshold": 2.0,
                    "max_corres_distance": 0.5,
                    "degen_thresh_trans": 50.0,
                    "degen_thresh_rot": 0.0,
                    "project_on_degneneracy": False}},
            "photometric": {
                "enabled": False,
                "rows": lm.n_rows, "cols": lm.n_cols,
                "fov_up_deg": float(np.degrees(lm.fov_up)),
                "fov_down_deg": float(np.degrees(lm.fov_down)),
                "range_min": 0.5, "range_max": 40.0,
                "patch_size": 5, "margin_size": 3,
                "intensity_scale": 1.0,
                "remove_lines": False, "filter_brightness": False,
                # the loader selects the reference's central-difference
                # gradients (cv::Sobel ksize=1 scale=0.5) — thresholds are
                # ~1/8 of 3x3-Sobel-scale values
                "gradient_threshold": 0.25,
                "nma_radius": 5, "num_features_detect": 48,
                "sigma": 0.25, "use_robust_cost_function": False}},
        "radar": {
            "T_B_S": [0, 0, 0, 0, 0, 0, 1],
            "manager": {"enabled": True, "noise_sigma": 0.05,
                        "filter_min_db": 5.0, "range_min": 0.1,
                        "range_max": 60.0, "threshold_azimuth_deg": 80.0,
                        "threshold_elevation_deg": 80.0,
                        "is_exposure_compensated": True,
                        "use_to_init": False}},
    }


def main():
    # dataset generation is host-side tooling: force the CPU backend
    # BEFORE any jax use (this container's sitecustomize forces the
    # tunneled TPU platform, where op-by-op generation costs ~25 ms/RPC
    # and would pointlessly claim the device)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mimosa_tpu.io import rosbag_writer as bw
    from mimosa_tpu.io import synthetic as syn

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    lm = syn.LidarModel()
    sequences = {
        "room_s": dict(world=syn.room_world(),
                       tc=syn.TrajectoryConfig(t_total=12.0),
                       imu_noise=0.01, range_noise=0.005, radar=False),
        "room_d": dict(world=syn.room_world(),
                       tc=syn.TrajectoryConfig(
                           t_total=12.0, amp=(3.0, 1.6, 0.5),
                           freq=(0.18, 0.25, 0.33), yaw_rate=0.6),
                       imu_noise=0.02, range_noise=0.01, radar=False),
        "corridor_s": dict(world=syn.corridor_world(),
                           tc=syn.TrajectoryConfig(
                               t_total=8.0, amp=(4.0, 0.6, 0.3),
                               center=(40.0, 2.0, 1.5), yaw_rate=0.15),
                           imu_noise=0.01, range_noise=0.005, radar=True),
        "corridor_d": dict(world=syn.corridor_world(),
                           tc=syn.TrajectoryConfig(
                               t_total=8.0, amp=(6.0, 0.8, 0.3),
                               freq=(0.14, 0.2, 0.28),
                               center=(40.0, 2.0, 1.5), yaw_rate=0.3),
                           imu_noise=0.02, range_noise=0.01, radar=True),
    }

    os.makedirs(args.out, exist_ok=True)
    for name, sc in sequences.items():
        seq_dir = os.path.join(args.out, name)
        os.makedirs(seq_dir, exist_ok=True)
        data = syn.generate(sc["world"], sc["tc"], lm, seed=args.seed,
                            imu_noise=sc["imu_noise"],
                            range_noise=sc["range_noise"])
        radar_frames = None
        if sc["radar"]:
            traj = syn.make_trajectory(sc["tc"])
            radar_frames = syn.generate_radar(traj, sc["tc"],
                                              seed=args.seed)
        bw.write_synthetic_bag(os.path.join(seq_dir, "seq.bag"), data,
                               radar_frames=radar_frames)
        with open(os.path.join(seq_dir, "gt.tum"), "w") as f:
            for t, p, q in zip(data["gt"]["ts"], data["gt"]["pos"],
                               data["gt"]["quat"]):
                f.write(f"{t} {p[0]} {p[1]} {p[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}\n")
        print(f"{name}: {len(data['scans'])} scans"
              + (f", {len(radar_frames)} radar frames" if radar_frames
                 else ""))

    with open(os.path.join(args.out, "params.yaml"), "w") as f:
        yaml.safe_dump(base_params(lm), f)
    ov_dir = os.path.join(args.out, "overrides")
    os.makedirs(ov_dir, exist_ok=True)
    with open(os.path.join(ov_dir, "li_degen.yaml"), "w") as f:
        yaml.safe_dump({"lidar": {"geometric": {"scan_to_map": {
            "project_on_degneneracy": True}}}}, f)
    with open(os.path.join(ov_dir, "pgli.yaml"), "w") as f:
        yaml.safe_dump({"lidar": {
            "geometric": {"scan_to_map": {"project_on_degneneracy": True}},
            "photometric": {"enabled": True}}}, f)
    print(f"dataset -> {args.out}")


if __name__ == "__main__":
    main()
