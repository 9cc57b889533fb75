"""mlinerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multi-light
intrinsic-aware neural radiance fields (MLI-NeRF) and its substrate models
(vanilla NeRF, Instant-NGP-style hash grids, Neuralangelo SDF rendering).

Built from scratch against the capability surface of the reference CUDA/torch
implementation (liulisixin/MLI-NeRF); the architecture is TPU-first:
  * all compute-path math is pure JAX, traced once per shape and fused by XLA;
  * the multiresolution hash encoder has a Pallas TPU kernel (ops/hashgrid);
  * multi-chip scaling shards the ray axis over a jax.sharding.Mesh (parallel/);
  * schedules (coarse-to-fine level masks, epsilon, loss weights) enter the
    jitted step as array inputs so 500k-iteration runs never recompile.
"""

__version__ = "0.1.0"
