"""onet-tpu: a TPU-native JAX framework for unsupervised binary semantic
segmentation with twin U-Nets (the "Onet" architecture), re-designed from
scratch for TPU hardware.

Capability parity target: joeyee/Onet (TIP-2025) — see SURVEY.md for the
component inventory. Everything here is a new TPU-first design:

* compute path: jax / XLA / pallas, NHWC layouts, bf16-on-MXU policies,
  fused complementary-branch forward (one 2B batch instead of two passes),
* data path: device-side `jax.random` clutter simulators (no host loader),
* parallel path: `jax.sharding.Mesh` + NamedSharding (data x space axes),
  XLA collectives — no host communication code.

Package map
-----------
core/       dtype policies, mesh helpers, PRNG plumbing, config, checkpoint
models/     functional U-Net / Onet (pure pytrees + apply fns)
ops/        numerics: log1pexp, normalization, image ops, pallas kernels
sim/        K-distributed & Rayleigh sea-clutter generators (device-side)
data/       dataset containers & batch iterators (simclutter / zy3 / nau)
metrics/    segmentation metric bundle, label alignment, psnr (device-side)
train/      train steps, schedules, workload drivers
parallel/   sharding strategies over the TPU mesh
preprocess/ dehazing / contrast / histogram preprocessing (jax ops)
report/     logging format, curves, tabular reports (host-side)
"""

__version__ = "0.1.0"
