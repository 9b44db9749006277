"""Cell-averaging CFAR baseline segmenter.

The reference's NAU rain experiment compares Onet against a CFAR detector
(``exp_nau_rain_20240513.py:115,208``: ``CFAR(kval, nref=16,
mguide=8).cfar_seg(img)``, with the note that kval=2.0 lands near
far=0.03); the ``cfar_segmentation_200527`` module itself is absent from
the snapshot (SURVEY §2.9). This is an independent TPU-native
implementation of the standard 2-D CA-CFAR that API names: per pixel, the
background level is the mean over a reference annulus — the outer
``(2*nref+1)²`` window minus the inner ``(2*mguide+1)²`` guard window —
and a detection is ``intensity > kval * background``.

Formulation: integral image (two cumsums) + four gathers per window —
O(1) per pixel regardless of window size, fully vectorized, exact at the
borders (window clipped, counts adjusted), jit/vmap-friendly with static
window radii.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _integral(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H+1, W+1] summed-area table with a zero top row/col."""
    s = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def _window_sums(ii: jnp.ndarray, h: int, w: int, r: int):
    """Per-pixel sums over the clipped centered (2r+1)² window.

    Returns (sums [H, W], counts [H, W])."""
    y0 = jnp.clip(jnp.arange(h) - r, 0, h)
    y1 = jnp.clip(jnp.arange(h) + r + 1, 0, h)
    x0 = jnp.clip(jnp.arange(w) - r, 0, w)
    x1 = jnp.clip(jnp.arange(w) + r + 1, 0, w)
    sums = (ii[y1[:, None], x1[None, :]] - ii[y0[:, None], x1[None, :]]
            - ii[y1[:, None], x0[None, :]] + ii[y0[:, None], x0[None, :]])
    counts = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums, counts


@partial(jax.jit, static_argnames=("nref", "mguide"))
def cfar_seg(img: jnp.ndarray, kval: float = 2.0, *, nref: int = 16,
             mguide: int = 8) -> jnp.ndarray:
    """CA-CFAR detection map for one [H, W] frame (int32 {0, 1}).

    ``nref``/``mguide`` are the outer/guard half-widths (the reference
    calls ``CFAR(kval=2.0, nref=16, mguide=8)``)."""
    assert nref > mguide >= 0, (nref, mguide)
    img = img.astype(jnp.float32)
    h, w = img.shape
    ii = _integral(img)
    ref_sum, ref_cnt = _window_sums(ii, h, w, nref)
    g_sum, g_cnt = _window_sums(ii, h, w, mguide)
    bg = (ref_sum - g_sum) / jnp.maximum(ref_cnt - g_cnt, 1)
    return (img > kval * bg).astype(jnp.int32)


def cfar_seg_batch(imgs: jnp.ndarray, kval: float = 2.0, *, nref: int = 16,
                   mguide: int = 8) -> jnp.ndarray:
    """Batched CA-CFAR: [N, H, W] or [N, H, W, 1] -> [N, H, W] int32."""
    if imgs.ndim == 4:
        imgs = imgs[..., 0]
    return jax.vmap(lambda f: cfar_seg(f, kval, nref=nref,
                                       mguide=mguide))(imgs)
