"""On-device array datasets and batch iteration.

The reference wraps every workload in torch Dataset/DataLoader with
``num_workers=0`` (dataloader/simbg4onet_20230209.py:141-151) — a host-side
python loop feeding one batch at a time over PCIe. The TPU design keeps the
whole (small) dataset resident in HBM and slices batches on device: an
epoch is a device-side gather by a shuffled index permutation, so the input
pipeline costs ~0 and never syncs the host.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ArrayDataset:
    """A dict of equal-leading-dim arrays living on device."""

    data: Dict[str, jnp.ndarray]

    def __post_init__(self):
        ns = {k: v.shape[0] for k, v in self.data.items()}
        if len(set(ns.values())) != 1:
            raise ValueError(f"ragged leading dims: {ns}")

    def __len__(self):
        return next(iter(self.data.values())).shape[0]

    def __getitem__(self, k):
        return self.data[k]

    def select(self, idx) -> "ArrayDataset":
        return ArrayDataset({k: v[idx] for k, v in self.data.items()})


def train_test_split(ds: ArrayDataset, key, train_frac: float = 0.9):
    """Shuffled split, train first (reference 90/10 convention,
    simbg4onet_20230209.py:119-133)."""
    n = len(ds)
    perm = jax.random.permutation(key, n)
    n_train = int(n * train_frac)
    return ds.select(perm[:n_train]), ds.select(perm[n_train:])


def batch_iterator(ds: ArrayDataset, batch_size: int, *, key=None,
                   drop_last: bool = False) -> Iterator[Dict[str, jnp.ndarray]]:
    """Yield batches; shuffles with ``key`` if given (device-side permutation).

    The last partial batch is kept by default (reference drop_last=False).
    """
    n = len(ds)
    if key is not None:
        order = jax.random.permutation(key, n)
    else:
        order = jnp.arange(n)
    stop = (n // batch_size) * batch_size if drop_last else n
    for lo in range(0, stop, batch_size):
        idx = order[lo:lo + batch_size]
        yield {k: v[idx] for k, v in ds.data.items()}


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
