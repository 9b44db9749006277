"""He-2009 dark-channel dehazing as pure XLA ops.

The reference runs this per image on the host with cv2 (haze_remove_20240313
.py:12-86; parameterization for ZY-3 at test_pre_processing_on_zy3_testset_
20240607.py:79-96: sz=3, radius=3, eps=1e-4, tx=0.3). Here every stage is a
jit-able jnp function on [H, W, 3] float arrays in [0, 1], so the cloud
"haze_enhance" channel can fuse into the on-device input pipeline.

Faithful quirks preserved:
* AtmLight averages the numpx-1 brightest dark-channel pixels but divides
  by numpx (the reference loop starts at 1, :31-34);
* TransmissionRefine converts to gray with cv2's BGR weights although the
  input is RGB (i.e. gray = 0.114 R + 0.587 G + 0.299 B, :69);
* erosion border behaves like cv2's default (+inf constant for min).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _min_pool(x, sz: int):
    """sz x sz erosion (min filter), SAME size, +inf border."""
    return -lax.reduce_window(-x, -jnp.inf, lax.max,
                              (sz, sz), (1, 1), "SAME")


def _box_mean(x, r: int):
    """cv2.boxFilter(ksize=(r, r), normalize=True) with reflect-101 border."""
    pad_lo = (r - 1) // 2
    pad_hi = r // 2
    xp = jnp.pad(x, ((pad_lo, pad_hi), (pad_lo, pad_hi)), mode="reflect")
    s = lax.reduce_window(xp, 0.0, lax.add, (r, r), (1, 1), "VALID")
    return s / (r * r)


def dark_channel(im, sz: int = 15):
    """min over RGB then sz x sz erosion. im: [H, W, 3]."""
    return _min_pool(jnp.min(im, axis=-1), sz)


def atm_light(im, dark):
    """Atmospheric light from the top-0.1% dark-channel pixels."""
    h, w = dark.shape
    numpx = max((h * w) // 1000, 1)
    flat_dark = dark.reshape(-1)
    flat_im = im.reshape(-1, 3)
    _, idx = lax.top_k(flat_dark, numpx)
    # reference loop `for ind in range(1, numpx)` skips the least-bright of
    # the top set but still divides by numpx
    take = flat_im[idx[: max(numpx - 1, 1)]] if numpx > 1 else flat_im[idx] * 0
    return jnp.sum(take, axis=0) / numpx


def transmission_estimate(im, a, sz: int = 15, omega: float = 0.95):
    # guard the degenerate numpx==1 case (images < 2000 px): the
    # reference's skip-the-first loop leaves a == 0 there, and im/0 would
    # cascade NaN through the whole pipeline (the reference never runs on
    # such small images; our micro-scale chain tests do). For any real
    # thumbnail (224^2 -> numpx=50) this clamp is inert.
    a_safe = jnp.maximum(a, 1e-6)
    return 1.0 - omega * dark_channel(im / a_safe[None, None, :], sz)


def guided_filter(guide, p, r: int, eps: float):
    mean_i = _box_mean(guide, r)
    mean_p = _box_mean(p, r)
    mean_ip = _box_mean(guide * p, r)
    cov_ip = mean_ip - mean_i * mean_p
    var_i = _box_mean(guide * guide, r) - mean_i * mean_i
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return _box_mean(a, r) * guide + _box_mean(b, r)


def transmission_refine(im, et, radius: int = 15, eps: float = 1e-4):
    # cv2 BGR2GRAY weights applied to an RGB array — kept verbatim
    gray = 0.114 * im[..., 0] + 0.587 * im[..., 1] + 0.299 * im[..., 2]
    return guided_filter(gray, et, radius, eps)


def recover(im, t, a, tx: float = 0.1):
    t = jnp.maximum(t, tx)[..., None]
    return (im - a[None, None, :]) / t + a[None, None, :]


@partial(jax.jit, static_argnames=("sz", "radius", "tx"))
def dehaze(im, *, sz: int = 3, radius: int = 3, eps: float = 1e-4,
           tx: float = 0.3):
    """Full pipeline -> (J dehazed, K cloud radiance). ZY-3 parameters
    (test_pre_processing...:87-96): J = Recover(tx=0.3), K = A.max()*(1-t)."""
    dark = dark_channel(im, sz)
    a = atm_light(im, dark)
    te = transmission_estimate(im, a, sz)
    t = transmission_refine(im, te, radius, eps)
    j = recover(im, t, a, tx)
    k = jnp.max(a) * (1.0 - t)
    return j, k


def haze_radiance(im, **kw):
    """K only (used by the haze_enhance preprocessing options)."""
    return dehaze(im, **kw)[1]
