"""Export the voxel map / accumulated cloud from a checkpoint.

The reference's accumulate_pcd.py + create_full_res_pointcloud equivalents:
reads a sequencer checkpoint (utils/checkpoint.py) and writes the map as a
PLY point cloud (voxel means, with plane normals) and/or npz.

Usage: python scripts/export_map.py ckpt.npz --ply map.ply [--npz map.npz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_ply(path, points, normals=None, counts=None):
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    cols = [points.astype(np.float32)]
    if normals is not None:
        props += ["property float nx", "property float ny",
                  "property float nz"]
        cols.append(normals.astype(np.float32))
    if counts is not None:
        props += ["property float quality"]
        cols.append(counts.astype(np.float32)[:, None])
    header = "\n".join([
        "ply", "format binary_little_endian 1.0", f"element vertex {n}",
        *props, "end_header", ""])
    body = np.concatenate(cols, axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(body.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--ply")
    ap.add_argument("--npz")
    ap.add_argument("--traj-tum", help="also export the trajectory")
    args = ap.parse_args()

    z = np.load(args.checkpoint)
    # VoxelMap leaves in NamedTuple order: coords, occupied, n, psum, pssum,
    # last_touch, mean, normal, plane_valid
    occ = z["vmap__1"][:-1]
    n = z["vmap__2"][:-1]
    mean = z["vmap__6"][:-1]
    normal = z["vmap__7"][:-1]
    valid = z["vmap__8"][:-1]
    sel = occ & (n > 0)
    print(f"{sel.sum()} occupied voxels, {(sel & valid).sum()} valid planes")
    if args.ply:
        write_ply(args.ply, mean[sel], normal[sel], n[sel])
        print(f"wrote {args.ply}")
    if args.npz:
        np.savez_compressed(args.npz, mean=mean[sel], normal=normal[sel],
                            count=n[sel], plane_valid=valid[sel])
        print(f"wrote {args.npz}")
    if args.traj_tum:
        import json
        meta = json.loads(bytes(z["_meta"]).decode())
        ts = meta["host"]["_traj_ts"]
        tq = z["traj_q__0"][: len(ts)]
        tp = z["traj_p__0"][: len(ts)]
        with open(args.traj_tum, "w") as f:
            for i, t in enumerate(ts):
                p, q = tp[i], tq[i]
                f.write(f"{t:.9f} {p[0]} {p[1]} {p[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}\n")
        print(f"wrote {args.traj_tum}")


if __name__ == "__main__":
    main()
