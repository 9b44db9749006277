"""Multi-host (multi-process) SPMD bootstrap.

The reference is strictly single-process/single-device (SURVEY §2.10); a
TPU *pod* deployment spans hosts, each owning a subset of chips, with XLA
collectives riding ICI inside a slice and DCN across slices. JAX's
coordination service (`jax.distributed`) makes every process see the
GLOBAL device set, after which the framework's existing mesh/step builders
(`core/mesh.py`, `train/steps.py`) work unchanged — the ONLY multi-host-
specific work is (a) initializing the coordination service and (b)
assembling global batch arrays from per-process host-local data. This
module owns both.

Usage (same script on every host):

    from onet_tpu.parallel import multihost
    multihost.initialize(coordinator="host0:9876",
                         num_processes=N, process_id=i)
    mesh = make_mesh()                       # over GLOBAL devices
    step = make_train_step(mesh=mesh, ...)   # unchanged
    xg = multihost.global_batch(mesh, local_frames)   # per-host shard in,
    params, bn, opt, loss = step(params, bn, opt, xg, lr)

Correctness is pinned by tests/test_multihost.py: two coordinated CPU
processes train-step a global batch and produce bit-identical loss and
parameter updates to the single-process run of the same batch.
"""

from __future__ import annotations

import numpy as np

import jax

from onet_tpu.core.mesh import batch_sharding


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids=None) -> None:
    """Join the JAX coordination service.

    ``coordinator`` is ``"host:port"`` of process 0. After this returns,
    ``jax.devices()`` is the global device list and ``jax.local_devices()``
    this process's slice; all processes must call every jitted computation
    collectively (standard SPMD contract).
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def process_batch_slice(global_n: int) -> slice:
    """The rows of a global batch this process is responsible for feeding
    (contiguous equal split in process order — matching ``global_batch``'s
    assembly of a batch-sharded array)."""
    per = global_n // jax.process_count()
    if per * jax.process_count() != global_n:
        raise ValueError(f"global batch {global_n} not divisible by "
                         f"{jax.process_count()} processes")
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch(mesh, local_frames: np.ndarray, *, spatial: bool = False):
    """Assemble a GLOBAL [N, H, W, C] batch-sharded array from this
    process's host-local frames (zero cross-host data movement: every
    shard stays on the devices of the process that produced it)."""
    sharding = batch_sharding(mesh, spatial=spatial)
    return jax.make_array_from_process_local_data(sharding, local_frames)


def fold_process_key(key):
    """Per-process PRNG stream: fold the process index into a base key so
    hosts generate disjoint data while staying reproducible."""
    return jax.random.fold_in(key, jax.process_index())
