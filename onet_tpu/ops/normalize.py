"""Min-max normalization primitives.

These mirror the reference's two host-side normalizers —
``array_normal`` (whole-array) and ``tensor_normal_per_frame``
(per frame & channel, keepdim min/max), utils_20231218.py:660-689 — as
device-side ops so preprocessing fuses into the forward pass instead of
round-tripping through the host.

``complement`` builds the adversarial input X_d = clip(1 - X + bias, 0, 1)
(Onet_vanilla_20240606.py:180).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

EPS = float(np.spacing(1.0))  # the reference's np.spacing(1) epsilon


def minmax_per_array(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize the whole array to [0, 1] (reference ``array_normal``)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + EPS)


def minmax_per_frame(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize each frame & channel independently.

    Accepts [N, H, W, C] (TPU-native layout) or [N, H, W]; reduction runs
    over the spatial axes only, matching ``tensor_normal_per_frame``'s
    per-(frame, channel) keepdim min/max.
    """
    if x.ndim == 4:
        axes = (1, 2)
    elif x.ndim == 3:
        axes = (1, 2)
    else:
        raise ValueError(f"expected [N,H,W,C] or [N,H,W], got shape {x.shape}")
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    return (x - lo) / (hi - lo + EPS)


def complement(x: jnp.ndarray, bias: float = 0.0) -> jnp.ndarray:
    return jnp.clip(1.0 - x + bias, 0.0, 1.0)
