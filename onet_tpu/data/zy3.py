"""ZY-3 cloud-detection data plumbing.

Sources:
* reference-format .pt dicts {img_id: {'true_color': [3,224,224] float,
  'mask': [224,224]}} (dataloader/zy3_cloud_thumbnailv5_20240304.py:80-106)
  — loaded host-side via torch, converted to NHWC device arrays with the
  id list kept host-side;
* ``synthesize_zy3`` — a device-side cloudy-scene generator (FFT-filtered
  noise clouds over smooth terrain) standing in for the external ZY-3
  imagery in tests/demos, and the analogue of the CloudAddition composite
  trainset (:262-309).

Augmented unsupervised batches use data.augment (device) instead of the
host albumentations loop.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.data.arrays import ArrayDataset


def load_zy3_dict_pt(path: str) -> Tuple[ArrayDataset, List[str]]:
    """Load a reference-format {id: {'true_color','mask'}} dict."""
    import torch

    d = torch.load(path, map_location="cpu")
    ids = list(d.keys())
    imgs = np.stack([np.array(d[i]["true_color"].numpy(), copy=True)
                     for i in ids]).transpose(0, 2, 3, 1)
    have_masks = all("mask" in d[i] for i in ids)
    data = {"imgs": jnp.asarray(imgs, jnp.float32)}
    if have_masks:
        masks = np.stack([np.array(d[i]["mask"].numpy(), copy=True)
                          for i in ids])
        data["labels"] = jnp.asarray(masks, jnp.float32)
    return ArrayDataset(data), ids


def _smooth_noise(key, shape, cutoff: float):
    """Low-pass-filtered white noise in [0,1] (cloud/terrain texture)."""
    h, w = shape
    noise = jax.random.normal(key, (h, w))
    f = jnp.fft.fft2(noise)
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]
    mask = jnp.exp(-((fx ** 2 + fy ** 2) / (2 * cutoff ** 2)))
    s = jnp.real(jnp.fft.ifft2(f * mask))
    lo, hi = jnp.min(s), jnp.max(s)
    return (s - lo) / (hi - lo + 1e-12)


def synthesize_zy3(key, n: int = 16, size: int = 224,
                   cloud_cover: float = 0.35):
    """Generate n cloudy RGB scenes + binary cloud masks.

    Terrain: smooth color field; clouds: thresholded low-pass noise blended
    in white with soft edges. Returns ArrayDataset{imgs, labels} and ids.
    """

    def one(k):
        kt, kc, ktint = jax.random.split(k, 3)
        terrain = _smooth_noise(kt, (size, size), 0.04)
        tint = jax.random.uniform(ktint, (3,), minval=0.15, maxval=0.55)
        rgb = terrain[..., None] * tint[None, None, :] + 0.15
        cl = _smooth_noise(kc, (size, size), 0.02)
        thresh = jnp.quantile(cl, 1.0 - cloud_cover)
        mask = (cl > thresh).astype(jnp.float32)
        alpha = jnp.clip((cl - thresh) / 0.12, 0.0, 1.0)[..., None]
        img = rgb * (1 - alpha) + alpha * 0.95
        return jnp.clip(img, 0, 1), mask

    imgs, masks = jax.vmap(one)(jax.random.split(key, n))
    ds = ArrayDataset({"imgs": imgs, "labels": masks})
    ids = [f"zy3_syn_{i:04d}" for i in range(n)]
    return ds, ids


def split_snow_mask(labels: jnp.ndarray):
    """3-valued ZY-3 masks -> (cloud_mask, snow_mask) float maps.

    Reference Snow_CloudDataset_Supervised splits mask==1 (cloud) and
    mask==2 (snow) into separate supervision channels
    (dataloader/zy3_cloud_thumbnailv5_20240304.py:199-203).
    """
    return ((labels == 1).astype(jnp.float32),
            (labels == 2).astype(jnp.float32))


def synthesize_cloud_addition(key, n: int = 8, size: int = 224,
                              cloud_cover: float = 0.35):
    """Cloud-addition composites: cloudless bright terrain + synthetic
    clouds (reference CloudDataset_CloudAddition, :262-309). Returns an
    ArrayDataset{terrain, imgs, labels} and ids — 'imgs' is the composite
    ('true_color'), 'terrain' the clean background."""

    def one(k):
        kt, kc, ktint = jax.random.split(k, 3)
        base = _smooth_noise(kt, (size, size), 0.04)
        tint = jax.random.uniform(ktint, (3,), minval=0.3, maxval=0.8)
        terrain = jnp.clip(base[..., None] * tint[None, None, :] + 0.2, 0, 1)
        cl = _smooth_noise(kc, (size, size), 0.02)
        thresh = jnp.quantile(cl, 1.0 - cloud_cover)
        mask = (cl > thresh).astype(jnp.float32)
        alpha = jnp.clip((cl - thresh) / 0.12, 0.0, 1.0)[..., None]
        composite = jnp.clip(terrain * (1 - alpha) + alpha * 0.95, 0, 1)
        return terrain, composite, mask

    terrain, imgs, masks = jax.vmap(one)(jax.random.split(key, n))
    ds = ArrayDataset({"terrain": terrain, "imgs": imgs, "labels": masks})
    return ds, [f"zy3_add_{i:04d}" for i in range(n)]

def supervised_batches(key, ds: ArrayDataset, ids, batch_sz: int, *,
                       aug: bool = True, snow_split: bool = False):
    """CloudDataset_Supervised / Snow_CloudDataset_Supervised semantics
    (dataloader/zy3_cloud_thumbnailv5_20240304.py:124-216): yield batches of
    (imgs, masks[, cloud, snow], ids) with the augmentation applied JOINTLY
    to image and mask (geometric ops move both, photometric image-only).
    With ``snow_split`` the {0,1,2}-valued mask additionally splits into the
    cloud==1 / snow==2 binary masks (:200-204).
    """
    from onet_tpu.data.augment import augment_batch_with_masks

    n = len(ds)
    order = (jax.random.permutation(key, n) if aug
             else jnp.arange(n))
    for bi, lo in enumerate(range(0, n, batch_sz)):
        sel = order[lo:lo + batch_sz]
        imgs = ds["imgs"][sel]
        masks = ds["labels"][sel]
        if aug:
            imgs, masks = augment_batch_with_masks(
                jax.random.fold_in(key, bi), imgs, masks)
        out = {"imgs": imgs, "labels": masks,
               "ids": [ids[int(i)] for i in np.asarray(sel)]}
        if snow_split:
            out["cloud"], out["snow"] = split_snow_mask(masks)
        yield out
