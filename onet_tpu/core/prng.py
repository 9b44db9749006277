"""PRNG plumbing.

The reference pins ``torch.manual_seed(1981); np.random.seed(1981)`` at
module import (Onet_vanilla_20240606.py:32-33). The JAX equivalent is an
explicit key threaded through init / data generation / augmentation; this
tiny helper keeps call sites tidy without hiding the functional key flow.
"""

from __future__ import annotations

import jax

DEFAULT_SEED = 1981


class RngStream:
    """A fold-in based key dispenser. Not thread-safe; one per driver."""

    def __init__(self, seed: int = DEFAULT_SEED):
        self._key = jax.random.key(seed)
        self._n = 0

    def next(self) -> jax.Array:
        self._n += 1
        return jax.random.fold_in(self._key, self._n)

    def split(self, n: int):
        keys = [self.next() for _ in range(n)]
        return keys
