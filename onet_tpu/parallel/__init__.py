"""Explicit SPMD execution: exact spatial partitioning via shard_map +
halo exchange, cross-replica BatchNorm, gradient-accumulation helpers."""

from onet_tpu.parallel.halo import (
    make_halo_ops,
    make_spatial_train_step,
)
