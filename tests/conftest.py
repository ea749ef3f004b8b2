"""Test fixture: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the real TPU backend and forces
``jax_platforms="axon,cpu"`` — tests must not compile on the (single,
tunneled) real chip, so we override the config to pure CPU *before* backends
initialize, and force 8 host devices so multi-chip sharding paths are
exercised. bench.py and the driver's dryrun use the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 available for oracle tests; library code derives dtype from inputs so
# production f32 paths are exercised by passing f32 arrays explicitly.
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite's big programs (bulk lax.scan
# chunks, the multimodal switch body, sharded shard_map steps) cost
# minutes of XLA CPU compile per run — cached, repeat suite runs skip
# all of it. The dir is keyed by the HOST CPU fingerprint (and kept
# separate from bench/replay's /root/.jax_cache) so that if this
# container ever lands on a different machine, stale CPU AOT blobs are
# not executed — XLA only warns ("could lead to SIGILL") when loading
# mismatched AOT results. NOTE: cpu_aot_loader "+prefer-no-scatter /
# +prefer-no-gather not supported on the host" warnings on cache HITS
# are a false alarm (XLA pseudo-features that never appear in host flag
# lists), not an actual machine mismatch.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _flags = ""
_fp = hashlib.sha1(_flags.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir",
                  f"/root/.jax_cache_tests_{_fp}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
