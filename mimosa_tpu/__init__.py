"""mimosa_tpu — TPU-native tightly-coupled multi-sensor state estimator.

A brand-new JAX/XLA/Pallas framework with the capabilities of ntnu-arl/mimosa
(see /root/reference): sliding-window factor-graph fusion of LiDAR (geometric
point-to-plane ICP + photometric intensity patches), radar radial speed,
external odometry, and gravity-aware preintegrated IMU.

Design stance (NOT a port): callbacks+mutexes -> deterministic host sequencer
feeding fixed-shape device buffers; iSAM2 -> dense sliding-window Gauss-Newton
with Schur-complement marginalization; iVox kNN -> voxel-hash map with
precomputed per-voxel plane moments; OpenMP point loops -> vmapped/Pallas
batched kernels; scaling via jax.sharding meshes and psum of normal-equation
blocks instead of threads.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 multiply / f32 accumulate; the estimator's
# normal-equation algebra (Schur-complement marginalization, covariance
# whitening, window Cholesky) is ill-conditioned enough that bf16 products
# diverge (first marginalization goes NaN on TPU while CPU f32 is fine).
# The hot kernels are gather/VPU-bound, not MXU-bound, so full f32 costs
# little here.
_jax.config.update("jax_default_matmul_precision", "highest")
