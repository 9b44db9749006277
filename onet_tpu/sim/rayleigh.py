"""Rayleigh-background Gaussian-EOT frame generator, fully on device.

Replaces the host-side numpy/scipy pipeline of
Rayleigh_bg_Gaussian_EOT_generator_20230208.py:219-325 with jax.random
generation under jit: training never blocks on host I/O and a whole PSNR
level (150 frames) is produced in one vmapped call.

Pipeline parity:
* background ~ Rayleigh(scale=1) at 400x400 (:221-222),
* 20 Gaussian extended targets, Swerling 0, peak-SNR calibrated (:229-242),
* per-frame whole-array min-max normalization (:262 via uti.array_normal),
* center-crop to 224 (:302-309),
* 11 PSNR levels (0..10) x 150 frames -> the `rayleigh_2sigma` dataset
  (:305-319).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onet_tpu.ops.normalize import minmax_per_array
from onet_tpu.sim.targets import place_gaussian_targets, rayleigh_sample

FRAME_SIZE = 400
CROP_SIZE = 224
FRAMES_PER_LEVEL = 150
PSNR_LEVELS = tuple(range(0, 11))


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Crop the trailing two spatial dims to ``size`` (torchvision
    CenterCrop semantics: offset = floor((dim - size) / 2))."""
    h, w = x.shape[-2], x.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size]


def _one_frame(key, snr_db, *, frame_size, n_targets, swerling):
    kb, kt = jax.random.split(key)
    bg = rayleigh_sample(kb, (frame_size, frame_size))
    frame, mask = place_gaussian_targets(kt, bg, snr_db,
                                         n_targets=n_targets, swerling=swerling)
    return minmax_per_array(frame), mask


@partial(jax.jit, static_argnames=("n_frames", "frame_size", "crop", "n_targets", "swerling"))
def rayleigh_frames(key, snr_db, *, n_frames: int = FRAMES_PER_LEVEL,
                    frame_size: int = FRAME_SIZE, crop: int = CROP_SIZE,
                    n_targets: int = 20, swerling: int = 0):
    """Generate one PSNR level: ([N, crop, crop] frames in [0,1], masks)."""
    keys = jax.random.split(key, n_frames)
    frames, masks = jax.vmap(
        lambda k: _one_frame(k, snr_db, frame_size=frame_size,
                             n_targets=n_targets, swerling=swerling)
    )(keys)
    return center_crop(frames, crop), center_crop(masks, crop)


def generate_rayleigh_dataset(key, *, levels=PSNR_LEVELS,
                              frames_per_level: int = FRAMES_PER_LEVEL,
                              crop: int = CROP_SIZE, swerling: int = 0,
                              bg: str = "rayleigh"):
    """The full simclutter dataset: dict of stacked frames/masks/psnrs.

    Mirrors the saved-.pt schema {imgs, labels, psnr} of prepare_data
    (:295-325) but stays on device. ``bg`` selects the clutter family like
    the reference's bg_type (Rayleigh_bg_...:251-275): "rayleigh"
    (rayleigh.rvs background, :219-249) or "k" (correlated K-distributed
    field via get_k_frame, :177-216) — the K simulator's spectral ACF is
    built once and shared across levels like the reference's KField cache.
    """
    assert bg in ("rayleigh", "k"), bg
    sim = None
    if bg == "k":
        from onet_tpu.sim.kdist import KDistSimulator, kdist_frames
        sim = KDistSimulator(jax.random.fold_in(key, 999))
    imgs, labels, psnrs = [], [], []
    for lvl in levels:
        k = jax.random.fold_in(key, lvl)
        if bg == "k":
            from onet_tpu.sim.kdist import kdist_frames
            f, m = kdist_frames(k, float(lvl), n_frames=frames_per_level,
                                crop=crop, swerling=swerling, sim=sim)
        else:
            f, m = rayleigh_frames(k, float(lvl), n_frames=frames_per_level,
                                   crop=crop, swerling=swerling)
        imgs.append(f)
        labels.append(m)
        psnrs.append(jnp.full((frames_per_level,), lvl, jnp.int32))
    return {
        "imgs": jnp.concatenate(imgs, axis=0)[:, :, :, None],  # NHWC, C=1
        "labels": jnp.concatenate(labels, axis=0),
        "psnr": jnp.concatenate(psnrs, axis=0),
    }
