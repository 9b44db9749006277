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
import numpy as np
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

# ---------------------------------------------------------------------------
# simclutter pixel compose (dataloader/simbg4onet_20230209.py:30-40)
# ---------------------------------------------------------------------------

def equalize_u8(img_u8):
    """cv2.equalizeHist semantics on a [H, W] uint8-valued float array:
    lut[i] = round((cdf(i) - cdf_min) / (N - cdf_min) * 255)."""
    v = img_u8.astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.float32).at[v.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(hist)
    nz = hist > 0
    cdf_min = jnp.min(jnp.where(nz, cdf, jnp.inf))
    total = cdf[-1]
    denom = jnp.maximum(total - cdf_min, 1.0)
    lut = jnp.round((cdf - cdf_min) / denom * 255.0)
    lut = jnp.clip(lut, 0, 255)
    return lut[v].astype(jnp.float32)


def clahe_u8(img_u8, *, tiles: int = 8, clip_limit: float = 4.0):
    """CLAHE (cv2.createCLAHE semantics) on a [H, W] uint8-valued float
    array; H and W must divide by ``tiles``. The histogram-excess
    redistribution is uniform-float rather than cv2's integer
    stride-residual scheme, so outputs match cv2 within ~2 gray levels.
    """
    h, w = img_u8.shape
    th, tw = h // tiles, w // tiles
    v = img_u8.astype(jnp.int32)
    tiled = v.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    tiled = tiled.reshape(tiles * tiles, th * tw)              # [T, P]
    one_hot = jax.nn.one_hot(tiled, 256, dtype=jnp.float32)
    hist = jnp.sum(one_hot, axis=1)                            # [T, 256]
    area = th * tw
    clip = max(int(clip_limit * area / 256), 1)                # cv2 int clip
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=1,
                     keepdims=True).astype(jnp.int32)          # [T, 1]
    batchv = excess // 256
    residual = excess - batchv * 256
    hist = jnp.minimum(hist, float(clip)) + batchv.astype(jnp.float32)
    # cv2's residual scheme: +1 at bins 0, step, 2*step, ... (residual bins)
    idx = jnp.arange(256)[None, :]
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)     # [T, 1]
    bump = ((idx % step == 0) & (idx // step < residual)).astype(jnp.float32)
    hist = hist + bump
    cdf = jnp.cumsum(hist, axis=1)
    scale = 255.0 / area
    luts = jnp.clip(jnp.round(cdf * scale), 0, 255)            # [T, 256]
    luts = luts.reshape(tiles, tiles, 256)

    # bilinear interpolation between the 4 neighboring tile LUTs
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5   # tile coords
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    def at(ty, tx):
        return luts[ty[:, None], tx[None, :], v]

    out = ((1 - fy) * (1 - fx) * at(y0, x0) + (1 - fy) * fx * at(y0, x1)
           + fy * (1 - fx) * at(y1, x0) + fy * fx * at(y1, x1))
    return jnp.round(out)


def defocus_u8(key, img_u8, *, radius_range=(3, 10)):
    """albumentations Defocus: disc-kernel blur with random integer radius.
    Implemented as a full conv with a masked disc kernel of the maximum
    radius (static shape), the mask selected by the drawn radius."""
    rmax = radius_range[1]
    r = jax.random.randint(key, (), radius_range[0], rmax + 1)
    k = 2 * rmax + 1
    yy = jnp.arange(k, dtype=jnp.float32) - rmax
    dist2 = yy[:, None] ** 2 + yy[None, :] ** 2
    disc = (dist2 <= r.astype(jnp.float32) ** 2).astype(jnp.float32)
    disc = disc / jnp.sum(disc)
    out = lax.conv_general_dilated(
        img_u8[None, :, :, None], disc[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return jnp.round(jnp.clip(out, 0, 255))


def coarse_dropout_u8(key, img_u8, *, holes: int = 8, hole_hw: int = 8):
    """albumentations CoarseDropout defaults: 8 holes of 8x8, fill 0."""
    h, w = img_u8.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (holes,), 0, h - hole_hw + 1)
    xs = jax.random.randint(kx, (holes,), 0, w - hole_hw + 1)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    keep = jnp.ones((h, w), jnp.bool_)
    for i in range(holes):
        inside = ((yy >= ys[i]) & (yy < ys[i] + hole_hw)
                  & (xx >= xs[i]) & (xx < xs[i] + hole_hw))
        keep = keep & ~inside
    return img_u8 * keep


def simclutter_pixel_augment_one(key, img):
    """The reference's simclutter pixel compose on ONE [H, W, 1] frame in
    [0, 1] (simbg4onetDataset, dataloader/simbg4onet_20230209.py:30-59):
    uint8 round-trip, then Defocus(p=.1), CLAHE(p=.1), Equalize(p=.1),
    PixelDropout(p=.1), GaussianBlur(p=.1), BrightnessContrast(p=.2),
    PixelDropout(p=.2), CoarseDropout(p=.2), HFlip(p=.2), then the
    reference's re-normalization QUIRK: the denominator mixes the
    augmented max with the ORIGINAL image min (:59).
    """
    orig = img
    u8 = jnp.round(jnp.clip(img[..., 0], 0, 1) * 255.0)
    ks = jax.random.split(key, 16)

    def maybe(i, p, fn, x):
        return jnp.where(jax.random.uniform(ks[i]) < p, fn(x), x)

    u8 = maybe(0, 0.1, lambda x: defocus_u8(ks[1], x), u8)
    u8 = maybe(2, 0.1, clahe_u8, u8)
    u8 = maybe(3, 0.1, equalize_u8, u8)
    u8 = maybe(4, 0.1,
               lambda x: x * jax.random.bernoulli(ks[5], 0.99, x.shape), u8)
    sigma = jax.random.uniform(ks[6], (), minval=0.5, maxval=2.0)
    u8 = maybe(7, 0.1,
               lambda x: jnp.round(gaussian_blur(x[..., None], sigma)[..., 0]),
               u8)
    u8 = maybe(8, 0.2,
               lambda x: brightness_contrast(ks[9], x[..., None] / 255.0)
               [..., 0] * 255.0, u8)
    u8 = maybe(10, 0.2,
               lambda x: x * jax.random.bernoulli(ks[11], 0.99, x.shape), u8)
    u8 = maybe(12, 0.2, lambda x: coarse_dropout_u8(ks[13], x), u8)
    u8 = maybe(14, 0.2, lambda x: x[:, ::-1], u8)

    aug = u8.astype(jnp.float32)
    lo = jnp.min(aug)
    # reference quirk (:59): the denominator mixes SCALES — the augmented
    # max (0..255) minus the ORIGINAL image min (0..1):
    #   (aug - aug.min()) / (aug.max() - image.min() + np.spacing(1))
    denom = jnp.max(aug) - jnp.min(orig[..., 0]) + _SPACING1
    return ((aug - lo) / denom)[..., None]


_SPACING1 = float(np.spacing(1.0))


@jax.jit
def simclutter_pixel_augment(key, imgs):
    """Batch version: imgs [B, H, W, 1] in [0, 1]."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(simclutter_pixel_augment_one)(keys, imgs)

# ---------------------------------------------------------------------------
# joint image+mask augmentation (supervised ZY-3 datasets)
# ---------------------------------------------------------------------------

def _nearest_sample(mask, yy, xx):
    """mask: [H, W]; nearest-neighbor sampling, zero outside (albumentations
    applies INTER_NEAREST to masks)."""
    h, w = mask.shape
    yi = jnp.round(yy)
    xi = jnp.round(xx)
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    return jnp.where(inside, mask[yc, xc], 0.0)


def _augment_one_with_mask(key, img, mask):
    """The ZY-3 compose applied JOINTLY to ([H,W,C] image, [H,W] label):
    geometric transforms hit both (mask nearest-resampled), photometric
    transforms hit the image only — CloudDataset_Supervised /
    Snow_CloudDataset_Supervised semantics
    (dataloader/zy3_cloud_thumbnailv5_20240304.py:124-216, alb compose
    :44-79 with the ``mask`` target)."""
    ks = jax.random.split(key, 8)
    h, w, _ = img.shape

    def geo(img, mask):
        sel = jax.random.randint(ks[1], (), 0, 3)
        img = lax.switch(sel, [
            lambda x: x[:, ::-1, :],
            lambda x: x[::-1, :, :],
            lambda x: jnp.swapaxes(x, 0, 1),
        ], img)
        mask = lax.switch(sel, [
            lambda m: m[:, ::-1],
            lambda m: m[::-1, :],
            lambda m: jnp.swapaxes(m, 0, 1),
        ], mask)
        return img, mask

    gi, gm = geo(img, mask)
    take = jax.random.uniform(ks[0]) < 0.8
    img = jnp.where(take, gi, img)
    mask = jnp.where(take, gm, mask)

    # rotate p=0.2 (bilinear image, nearest mask)
    ang = jax.random.uniform(ks[2], (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    sy, sx = cos * yy - sin * xx + cy, sin * yy + cos * xx + cx
    take = jax.random.uniform(ks[3]) < 0.2
    img = jnp.where(take, _bilinear_sample(img, sy, sx), img)
    mask = jnp.where(take, _nearest_sample(mask, sy, sx), mask)

    # photometric (image only): snow p=0.1, brightness/contrast p=0.1
    img = jnp.where(jax.random.uniform(ks[4]) < 0.1,
                    random_snow(ks[5], img), img)
    kbc, kp = jax.random.split(jax.random.fold_in(key, 99))
    img = jnp.where(jax.random.uniform(kp) < 0.1,
                    brightness_contrast(kbc, img), img)
    return img, mask


@jax.jit
def augment_batch_with_masks(key, imgs, masks):
    """imgs [B,H,W,C] in [0,1], masks [B,H,W] (any label values) ->
    jointly augmented (imgs, masks)."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(_augment_one_with_mask)(keys, imgs, masks)
