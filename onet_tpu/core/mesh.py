"""Device-mesh and sharding helpers.

The reference is single-device (SURVEY.md section 2.10: no distributed code
anywhere). The TPU build scales via SPMD over a 2-axis logical mesh:

* ``data``  — batch dimension (pure data parallelism; gradients reduce over
  ICI with an XLA all-reduce inserted by GSPMD),
* ``space`` — image-height dimension (spatial partitioning of the conv
  stack; XLA inserts halo exchanges for the 3x3 convs automatically).

Everything is plain ``jax.jit`` + ``NamedSharding``: there is no hand-rolled
communication code to maintain, and the same program runs on 1 chip or a
full pod slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"      # image height (rows)
SPACEW_AXIS = "spacew"    # image width (cols) — 2-D spatial partitioning
#                           maps tiles onto the TPU torus (parallel/halo.py)


def make_mesh(shape=None, devices=None, axis_names=(DATA_AXIS, SPACE_AXIS)) -> Mesh:
    """Build a logical mesh. Default: all devices on the ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, spatial: bool = False, rank: int = 4) -> NamedSharding:
    """Sharding for an [N, H, W, C] image batch.

    N shards over ``data``; with ``spatial=True`` H additionally shards over
    ``space`` so a single large tile can span chips (GSPMD handles conv
    halos).
    """
    spec = [None] * rank
    spec[0] = DATA_AXIS
    if spatial and SPACE_AXIS in mesh.axis_names:
        spec[1] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def put_per_spec(tree, sharding):
    """Device-put every leaf of ``tree`` with ``sharding``."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
