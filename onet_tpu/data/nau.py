"""NAU marine-radar rain-clutter data.

Reference loader: dataloader/nau_rain_20230523.py — a .pt dict
{name: {'img': [200,200] tensor, 'label': [200,200]}} with per-image
min-max normalization at construction (:22-28). Here: host torch load ->
NHWC device arrays + id list; plus a synthetic generator (rain cells =
anisotropic smooth blobs over Rayleigh-ish speckle) for tests/demos where
the real radar file is unavailable.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.data.arrays import ArrayDataset
from onet_tpu.data.zy3 import _smooth_noise
from onet_tpu.ops.normalize import minmax_per_frame
from onet_tpu.sim.targets import rayleigh_sample


def load_nau_dict_pt(path: str) -> Tuple[ArrayDataset, List[str]]:
    import torch

    d = torch.load(path, map_location="cpu")
    ids = list(d.keys())
    imgs = np.stack([np.array(d[i]["img"].numpy(), copy=True) for i in ids])
    labels = np.stack([np.array(d[i]["label"].numpy(), copy=True) for i in ids])
    imgs = jnp.asarray(imgs, jnp.float32)[..., None]
    ds = ArrayDataset({
        "imgs": minmax_per_frame(imgs),          # per-image normalize (:22-28)
        "labels": jnp.asarray(labels, jnp.float32),
    })
    return ds, ids


def synthesize_nau_rain(key, n: int = 10, size: int = 200,
                        rain_cover: float = 0.25):
    """Radar-like frames: speckle background + bright smooth rain masses."""

    def one(k):
        kb, kr = jax.random.split(k)
        bg = rayleigh_sample(kb, (size, size))
        rain = _smooth_noise(kr, (size, size), 0.015)
        thresh = jnp.quantile(rain, 1.0 - rain_cover)
        mask = (rain > thresh).astype(jnp.float32)
        strength = jnp.clip((rain - thresh) / 0.1, 0.0, 1.0)
        img = bg + 6.0 * strength
        return img, mask

    imgs, masks = jax.vmap(one)(jax.random.split(key, n))
    ds = ArrayDataset({
        "imgs": minmax_per_frame(imgs[..., None]),
        "labels": masks,
    })
    return ds, [f"nau_syn_{i:03d}" for i in range(n)]
