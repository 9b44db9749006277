"""Numerically stable scalar math used by the JSD objective.

``log1pexp`` matches the reference's piecewise scheme and thresholds
(Onet_vanilla_20240606.py:237-251, after Maechler's log1mexp note):

    x <= -37        -> exp(x)
    -37 < x <= 18   -> log1p(exp(x))
    18 < x < 33.3   -> x + exp(-x)
    x >= 33.3       -> x

The jnp implementation is branch-free (jnp.where over clamped arguments so
no branch ever sees an overflowing exp — keeps both values and gradients
finite under jit/vmap, unlike a naive where(exp(x)...) that would generate
inf * 0 NaNs in the cotangent).
"""

from __future__ import annotations

import jax.numpy as jnp


def log1pexp(x: jnp.ndarray) -> jnp.ndarray:
    dtype = x.dtype
    lo, mid, hi = -37.0, 18.0, 33.3
    # Clamp the argument fed to each branch so the unselected lane can not
    # overflow; jnp.where then picks the reference's branch exactly.
    x_lo = jnp.minimum(x, lo)        # exp() safe
    x_mid = jnp.clip(x, lo, mid)     # log1p(exp()) safe
    x_hi = jnp.maximum(x, mid)       # exp(-x) safe
    out = jnp.where(
        x <= lo,
        jnp.exp(x_lo),
        jnp.where(
            x <= mid,
            jnp.log1p(jnp.exp(x_mid)),
            jnp.where(x < hi, x_hi + jnp.exp(-x_hi), x),
        ),
    )
    return out.astype(dtype)
