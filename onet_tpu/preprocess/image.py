"""Image preprocessing: histogram equalization, contrast enhancement,
thumbnail construction with the 9 ZY-3 preprocessing options.

Parity targets:
* ``equalize_uint8`` — PIL ImageOps.equalize's exact integer LUT algorithm
  (used via torchvision transforms.functional.equalize in
  test_pre_processing_on_zy3_testset_20240607.py:126,145,153),
* ``contrast_enhance`` — PIL ImageEnhance.Contrast(0.5): blend with a solid
  gray at the rounded mean of the L channel (:66-78),
* ``thumbnail_rgb`` — Resize(smaller-edge=300, bilinear) -> CenterCrop(224)
  (:113-115),
* ``apply_pre_option`` — the 9 options of make_thrumnail_image (:118-174).

Everything operates on numpy uint8 [H, W, 3] for the LUT stages (exact
integer semantics) and hands float arrays to the jax dehaze ops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.preprocess.haze import dehaze

PRE_OPTIONS = (
    "raw_rgb",
    "histeq_rgb", "contrast_enhance", "haze_enhance", "haze_remove",
    "histeq_haze_enhance", "histeq_haze_remove",
    "contrast_enhance_haze_enhance", "contrast_enhance_haze_remove",
)


def equalize_uint8(img: np.ndarray) -> np.ndarray:
    """PIL ImageOps.equalize on a [H, W, C] uint8 array (per channel)."""
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        band = img[..., c]
        h = np.bincount(band.reshape(-1), minlength=256)
        nonzero = h[h > 0]
        if len(nonzero) <= 1:
            out[..., c] = band
            continue
        step = (int(h.sum()) - int(nonzero[-1])) // 255
        if step == 0:
            out[..., c] = band
            continue
        lut = np.empty(256, np.int64)
        n = step // 2
        for i in range(256):
            lut[i] = n // step
            n += int(h[i])
        out[..., c] = np.clip(lut, 0, 255).astype(np.uint8)[band]
    return out


def contrast_enhance(img: np.ndarray, factor: float = 0.5) -> np.ndarray:
    """PIL ImageEnhance.Contrast on a [H, W, 3] uint8 array."""
    f = img.astype(np.int64)
    l = (f[..., 0] * 299 + f[..., 1] * 587 + f[..., 2] * 114) / 1000
    mean = int(np.mean(l.astype(np.uint8)) + 0.5)
    blended = img.astype(np.float64) * factor + mean * (1.0 - factor)
    # PIL Image.blend rounds half away from zero via int conversion
    return np.clip(blended + 0.5, 0, 255).astype(np.uint8)


def rgb_resize_smaller_edge(img: np.ndarray, target: int) -> np.ndarray:
    """Bilinear resize so the smaller edge == target (torchvision Resize(n)
    semantics). Uses jax.image.resize; PIL's antialiased bilinear differs in
    the sub-1% regime, acceptable for thumbnail curation."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = target, max(1, round(w * target / h))
    else:
        nh, nw = max(1, round(h * target / w)), target
    out = jax.image.resize(jnp.asarray(img, jnp.float32), (nh, nw, img.shape[2]),
                           method="bilinear", antialias=True)
    return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)


def center_crop_hw(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return img[top:top + size, left:left + size]


def thumbnail_rgb(img: np.ndarray, *, resize_to: int = 300,
                  crop: int = 224) -> np.ndarray:
    return center_crop_hw(rgb_resize_smaller_edge(img, resize_to), crop)


def _haze_terms(u8: np.ndarray):
    i = u8.astype(np.float32) / 255.0
    j, k = dehaze(jnp.asarray(i))
    return np.asarray(j), np.asarray(k)


def apply_pre_option(u8: np.ndarray, option: str) -> np.ndarray:
    """One of the 9 preprocessing options on a uint8 [H,W,3] thumbnail ->
    float32 [H,W,3] in [0,1] (the reference's ToTensor output)."""
    assert option in PRE_OPTIONS, option
    if option == "raw_rgb":
        out = u8
    elif option == "histeq_rgb":
        out = equalize_uint8(u8)
    elif option == "contrast_enhance":
        out = contrast_enhance(u8)
    elif option == "haze_remove":
        j, _ = _haze_terms(u8)
        out = (np.clip(j, 0, 1) * 255).astype(np.uint8)
    elif option == "haze_enhance":
        i = u8.astype(np.float32) / 255.0
        _, k = _haze_terms(u8)
        i = np.clip(i + np.stack([k, k, k], axis=2), 0, 1)
        out = (i * 255).astype(np.uint8)
    elif option in ("histeq_haze_enhance", "contrast_enhance_haze_enhance"):
        base = equalize_uint8(u8) if option.startswith("histeq") else contrast_enhance(u8)
        i = base.astype(np.float32) / 255.0
        _, k = _haze_terms(base)
        i = np.clip(i + np.stack([1.7 * k, 1.7 * k, 1.7 * k], axis=2), 0, 1)
        out = (i * 255).astype(np.uint8)
    elif option in ("histeq_haze_remove", "contrast_enhance_haze_remove"):
        base = equalize_uint8(u8) if option.startswith("histeq") else contrast_enhance(u8)
        j, _ = _haze_terms(base)
        out = (np.clip(j, 0, 1) * 255).astype(np.uint8)
    return out.astype(np.float32) / 255.0
