"""Tiled serving for scenes larger than the training tile.

The reference operates on fixed small crops (224^2 thumbnails,
Rayleigh_bg_...:302-309); production imagery (full ZY-3 scenes, radar
sweeps) is arbitrarily large. This module serves any [H, W, C] scene by
tiling it into fixed-shape context windows, batching the windows through
ONE compiled graph (fixed shapes: no recompilation per scene size),
cropping to the emit regions, and reassembling the mask.

Windows are CLAMPED inside the scene: a window near a border is slid
inward so the scene border coincides with the window border — border
pixels then see exactly the same SAME-conv zero padding as whole-scene
inference, and interior pixels get >= ``halo`` pixels of true context
(only long-range context beyond the halo can differ; the tests measure
the agreement). No synthetic padding is ever introduced unless the whole
scene is smaller than one window.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _plan(size: int, tile: int) -> list:
    """Emit-region start offsets covering [0, size): stride ``tile``, last
    start clamped (pixels are covered once; overlaps re-emit identically)."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, tile)) + [size - tile]
    return starts


def infer_tiled(infer_fn, model_arg, scene, *, tile: int = 512,
                halo: int = 32, batch: int = 8):
    """Run ``labels = infer_fn(model_arg, x)[1]`` over an [H, W, C] scene.

    Returns the [H, W] int mask. All device calls share one
    [batch, tile + 2*halo, tile + 2*halo, C] shape.
    """
    h, w, c = scene.shape
    t, win = tile, tile + 2 * halo
    scene = np.asarray(scene, np.float32)
    ph, pw = max(win - h, 0), max(win - w, 0)
    if ph or pw:  # scene smaller than one window: zero-pad (conv-SAME-like)
        scene = np.pad(scene, ((0, ph), (0, pw), (0, 0)))
    sh, sw = scene.shape[:2]

    coords = []
    for y in _plan(h, t):
        wy = min(max(y - halo, 0), sh - win)
        for x in _plan(w, t):
            wx = min(max(x - halo, 0), sw - win)
            coords.append((y, x, wy, wx))
    wins = np.stack([scene[wy:wy + win, wx:wx + win, :]
                     for _, _, wy, wx in coords])

    out = np.zeros((h, w), np.int32)
    n = wins.shape[0]
    for i in range(0, n, batch):
        chunk = wins[i:i + batch]
        k = chunk.shape[0]
        if k < batch:  # keep ONE compiled shape
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - k, axis=0)])
        labels = np.asarray(infer_fn(model_arg, jnp.asarray(chunk))[1])
        for j in range(k):
            y, x, wy, wx = coords[i + j]
            oy, ox = y - wy, x - wx
            crop = labels[j, oy:oy + t, ox:ox + t]
            ey, ex = min(t, h - y), min(t, w - x)
            out[y:y + ey, x:x + ex] = crop[:ey, :ex]
    return out
