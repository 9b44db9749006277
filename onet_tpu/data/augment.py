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
bilinear sampler (gather-based, static shapes); elastic deformation uses a
gaussian-smoothed random displacement field and grid distortion a
piecewise-linear stretched coordinate map, both matching the albumentations
semantics.
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

    # one-of distortion family p=0.1: elastic / grid / defocus blur
    def distort(img):
        kd = jax.random.fold_in(key, 55)
        sel = jax.random.randint(jax.random.fold_in(kd, 1), (), 0, 3)
        sigma = jax.random.uniform(ks[6], (), minval=0.5, maxval=2.0)
        return lax.switch(sel, [
            lambda x: elastic_warp(jax.random.fold_in(kd, 2), x),
            lambda x: grid_distortion(jax.random.fold_in(kd, 3), x),
            lambda x: gaussian_blur(x, sigma),
        ], img)

    img = jnp.where(jax.random.uniform(ks[7]) < 0.1, distort(img), img)

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


def elastic_warp(key, img, *, alpha: float = 120.0, sigma: float = 6.0):
    """Elastic deformation (albumentations ElasticTransform semantics):
    random unit displacement field, gaussian-smoothed with ``sigma``,
    scaled by ``alpha`` pixels, applied with bilinear resampling."""
    h, w, _ = img.shape
    kx, ky = jax.random.split(key)
    dx = jax.random.uniform(kx, (h, w), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(ky, (h, w), minval=-1.0, maxval=1.0)
    dx = gaussian_blur(dx[..., None], sigma, radius=int(2 * sigma))[..., 0]
    dy = gaussian_blur(dy[..., None], sigma, radius=int(2 * sigma))[..., 0]
    # normalize the smoothed field to unit max amplitude, then scale
    norm = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(dy))) + 1e-6
    dx = dx / norm * (alpha / 10.0)
    dy = dy / norm * (alpha / 10.0)
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0) + dy
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1) + dx
    return _bilinear_sample(img, yy, xx)


def grid_distortion(key, img, *, num_steps: int = 5, limit: float = 0.3):
    """Grid distortion (albumentations GridDistortion semantics): per-grid-
    cell random stretch factors integrated into a monotone coordinate map."""
    h, w, _ = img.shape
    kx, ky = jax.random.split(key)

    def axis_map(k, size):
        steps = 1.0 + jax.random.uniform(k, (num_steps,),
                                         minval=-limit, maxval=limit)
        cell = size / num_steps
        # cumulative cell boundaries under the stretched metric
        stretched = jnp.concatenate([jnp.zeros((1,)),
                                     jnp.cumsum(steps * cell)])
        stretched = stretched / stretched[-1] * (size - 1)
        # source coordinate for each destination pixel: piecewise-linear
        # inverse of the stretch (dest grid is uniform)
        dst = jnp.linspace(0.0, size - 1, num_steps + 1)
        coords = jnp.arange(size, dtype=jnp.float32)
        return jnp.interp(coords, stretched, dst)

    src_y = axis_map(ky, h)[:, None] * jnp.ones((1, w))
    src_x = axis_map(kx, w)[None, :] * jnp.ones((h, 1))
    return _bilinear_sample(img, src_y, src_x)
