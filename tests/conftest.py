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
# NO persistent compile cache on CPU: deserializing cached XLA:CPU
# executables SEGFAULTED inside
# jax compilation_cache.get_executable_and_time on the suite's large
# programs (the multimodal bulk switch body — measured r4, fuzz run),
# after first flooding cpu_aot_loader machine-feature warnings and LLVM
# "Cannot allocate memory" errors. The TPU cache (/root/.jax_cache used
# by bench/replay) is unaffected — TPU executables serialize through
# the relay safely. CPU suite runs pay the compile each process.
