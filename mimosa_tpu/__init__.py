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
