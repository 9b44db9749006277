"""Explicit SPMD execution: exact spatial partitioning via shard_map +
halo exchange, exact channel tensor-parallelism (Megatron-style
column/row-parallel convs), cross-replica BatchNorm, and
gradient-accumulation helpers."""

from onet_tpu.parallel.halo import (
    make_halo_ops,
    make_spatial_train_step,
)
from onet_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_tp_train_step,
)
