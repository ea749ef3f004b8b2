"""Checkpoint / resume of the full estimator state.

The reference has none (SURVEY.md §5: "The estimator state (map, window,
biases) is not serializable") — for long multi-host runs restartability is
required, so every device pytree (window, voxel map, preintegration chain,
features, keyframes, trajectory ring, debug records) plus the host-side
sequencer state (IMU buffer, timestamps, counters) round-trips through one
compressed npz.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

_DEVICE_ATTRS = ("window", "vmap", "preints", "fv", "features",
                 "kf_q", "kf_p", "kf_count", "traj_q", "traj_p",
                 "debug_rec")
_HOST_ATTRS = ("n_active", "initialized", "scan_idx", "last_state_ts",
               "state_ts", "counters", "_traj_ts", "_traj_src")


def save(seq, path):
    """Serialize a Sequencer to ``path`` (npz)."""
    arrays = {}
    meta = {"tree": {}}
    for name in _DEVICE_ATTRS:
        tree = getattr(seq, name, None)
        if tree is None:
            meta["tree"][name] = None
            continue
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        meta["tree"][name] = len(leaves)
        # jitted-fetch: makes the copy of a donated-chain array
        # well-defined, but on a tunneled relay the readback ITSELF still
        # downgrades the session — a checkpoint mid-run costs the rest of
        # the process 17x regardless (sequencer._host_fetch docstring);
        # checkpoint at end-of-process or between relay sessions only
        from mimosa_tpu.graph.sequencer import _host_fetch
        for i, leaf in enumerate(leaves):
            arrays[f"{name}__{i}"] = np.asarray(_host_fetch(leaf))
    meta["host"] = {k: getattr(seq, k) for k in _HOST_ATTRS}
    arrays["imu_ts"] = seq.imu.ts
    arrays["imu_acc"] = seq.imu.acc
    arrays["imu_gyro"] = seq.imu.gyro
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(seq, path):
    """Restore a Sequencer's state in place. ``seq`` must be constructed
    with the same configs (shapes must match)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["_meta"]).decode())
    for name in _DEVICE_ATTRS:
        n = meta["tree"].get(name)
        if n is None:
            continue
        cur = getattr(seq, name)
        leaves, treedef = jax.tree_util.tree_flatten(cur)
        assert len(leaves) == n, f"{name}: structure mismatch"
        new_leaves = [jnp.asarray(z[f"{name}__{i}"]).astype(leaves[i].dtype)
                      for i in range(n)]
        setattr(seq, name, jax.tree_util.tree_unflatten(treedef, new_leaves))
    h = meta["host"]
    seq.n_active = int(h["n_active"])
    seq.initialized = bool(h["initialized"])
    seq.scan_idx = int(h["scan_idx"])
    seq.last_state_ts = h["last_state_ts"]
    seq.state_ts = list(h["state_ts"])
    seq.counters = {k: int(v) for k, v in h["counters"].items()}
    seq._traj_ts = list(h["_traj_ts"])
    # pre-_traj_src checkpoints: no per-row scan source -> no pose info
    seq._traj_src = [int(v) for v in h.get(
        "_traj_src", [-1] * len(seq._traj_ts))]
    seq.imu.ts = z["imu_ts"]
    seq.imu.acc = z["imu_acc"]
    seq.imu.gyro = z["imu_gyro"]
    return seq
