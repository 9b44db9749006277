"""Device-side stochastic augmentation (jax.random), replacing the host
albumentations pipelines.

Reference pipelines being covered:
* ZY-3 unsupervised train aug (dataloader/zy3_cloud_thumbnailv5_20240304
  .py:44-79): one-of {hflip, vflip, transpose} p=0.8; rotate(-90..90) p=0.2;
  RandomSnow p=0.1; one-of distortion/defocus p=0.1; brightness/contrast
  p=0.1.
* simclutter pixel aug (dataloader/simbg4onet_20230209.py:30-40) — blur /
  brightness-contrast / dropout / hflip, each p<=0.2 (train only; the
  published config runs with aug off).

Design: one jitted `augment_batch` applied to the whole [B, H, W, C] batch
per step; each frame draws its own op selector. Geometric warps use a
bilinear affine sampler (gather-based, static shapes). Elastic/grid
distortions are approximated by the affine + blur family — they serve the
same regularization role for the unsupervised objective; documented
deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _bilinear_sample(img, yy, xx):
    """img: [H, W, C]; yy/xx: [H, W] float sample coords. Zero padding."""
    h, w, _ = img.shape
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    ty = yy - y0
    tx = xx - x0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img[yc, xc]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    ty = ty[..., None]
    tx = tx[..., None]
    return ((v00 * (1 - tx) + v01 * tx) * (1 - ty)
            + (v10 * (1 - tx) + v11 * tx) * ty)


def rotate(img, angle_rad):
    """Rotate about the center, bilinear, zero fill. img: [H, W, C]."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    return _bilinear_sample(img, src_y, src_x)


def gaussian_blur(img, sigma, *, radius: int = 4):
    """Separable gaussian blur; sigma may be traced. img: [H, W, C]."""
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)
    x = jnp.moveaxis(img, -1, 0)[:, None]           # [C, 1, H, W]
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = lax.conv_general_dilated(x, kh, (1, 1), [(radius, radius), (0, 0)],
                                 dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (radius, radius)],
                                 dimension_numbers=dn)
    return jnp.moveaxis(x[:, 0], 0, -1)


def random_snow(key, img, *, point=(0.1, 0.2), brightness: float = 2.5):
    """Brighten the brightest quantile band (albumentations RandomSnow's
    visual effect: snow-like highlights)."""
    kq, = jax.random.split(key, 1)
    q = jax.random.uniform(kq, (), minval=1 - point[1], maxval=1 - point[0])
    thresh = jnp.quantile(img, q)
    return jnp.clip(jnp.where(img > thresh, img * brightness, img), 0.0, 1.0)


def brightness_contrast(key, img, *, b_limit=(0.04, 0.38),
                        c_limit=(-0.19, 0.35)):
    kb, kc = jax.random.split(key)
    beta = jax.random.uniform(kb, (), minval=b_limit[0], maxval=b_limit[1])
    alpha = 1.0 + jax.random.uniform(kc, (), minval=c_limit[0], maxval=c_limit[1])
    return jnp.clip(img * alpha + beta, 0.0, 1.0)


def pixel_dropout(key, img, p: float = 0.01):
    mask = jax.random.bernoulli(key, 1 - p, img.shape[:2])
    return img * mask[..., None]


def _augment_one(key, img):
    """The ZY-3-style compose on one [H, W, C] frame."""
    ks = jax.random.split(key, 8)

    # one-of geometric p=0.8: hflip / vflip / transpose
    def geo(img):
        sel = jax.random.randint(ks[1], (), 0, 3)
        return lax.switch(sel, [
            lambda x: x[:, ::-1, :],
            lambda x: x[::-1, :, :],
            lambda x: jnp.swapaxes(x, 0, 1),
        ], img)

    img = jnp.where(jax.random.uniform(ks[0]) < 0.8, geo(img), img)

    # rotate (-90deg, 90deg) p=0.2
    ang = jax.random.uniform(ks[2], (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    img = jnp.where(jax.random.uniform(ks[3]) < 0.2, rotate(img, ang), img)

    # snow p=0.1
    img = jnp.where(jax.random.uniform(ks[4]) < 0.1,
                    random_snow(ks[5], img), img)

    # defocus-ish blur p=0.1
    sigma = jax.random.uniform(ks[6], (), minval=0.5, maxval=2.0)
    img = jnp.where(jax.random.uniform(ks[7]) < 0.1,
                    gaussian_blur(img, sigma), img)

    # brightness/contrast p=0.1
    kbc, kp = jax.random.split(jax.random.fold_in(key, 99))
    img = jnp.where(jax.random.uniform(kp) < 0.1,
                    brightness_contrast(kbc, img), img)
    return img


@jax.jit
def augment_batch(key, imgs):
    """imgs: [B, H, W, C] in [0, 1] -> augmented, same shape."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(_augment_one)(keys, imgs)
