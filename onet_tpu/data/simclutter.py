"""Simulated sea-clutter dataset plumbing.

Two sources, one schema {imgs [N,H,W,1], labels [N,H,W], psnr [N]}:

* **device generation** (the TPU-native default): sim.rayleigh /
  sim.kdist generate straight into HBM — no files, no host loop;
* **.pt ingestion** for parity runs against the reference's saved
  ``rayleigh_2sigma.pt`` dicts (dataloader/simbg4onet_20230209.py:106-112):
  torch loads on host, converts to NHWC jnp arrays.

Both paths re-apply the loader's per-frame min-max normalization
(tensor_normal_per_frame at :110) and support the SNR-range filtering +
90/10 shuffled split of make_dataloader_snr_range (:290-359).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.data.arrays import ArrayDataset, train_test_split
from onet_tpu.ops.normalize import minmax_per_frame
from onet_tpu.sim.rayleigh import generate_rayleigh_dataset


def load_simclutter_pt(path: str) -> ArrayDataset:
    """Ingest a reference-format .pt dict ({bg}_imgs [N,1,H,W], {bg}_labels
    [N,H,W], psnr list)."""
    import torch  # host-side only

    d = torch.load(path, map_location="cpu")
    img_key = next(k for k in d if k.endswith("_imgs"))
    lab_key = next(k for k in d if k.endswith("_labels"))
    imgs = np.array(d[img_key].numpy(), copy=True).transpose(0, 2, 3, 1)
    labels = np.array(d[lab_key].numpy(), copy=True)
    psnr = np.asarray(d["psnr"], np.int32)
    return ArrayDataset({
        "imgs": jnp.asarray(imgs, jnp.float32),
        "labels": jnp.asarray(labels, jnp.float32),
        "psnr": jnp.asarray(psnr),
    })


def filter_by_snr_range(ds: ArrayDataset, low: int, high: int) -> ArrayDataset:
    """Keep frames with low <= psnr <= high (host-side boolean gather —
    dataset curation happens once, outside jit)."""
    snr = np.asarray(ds["psnr"])
    idx = np.nonzero((snr >= low) & (snr <= high))[0]
    return ds.select(jnp.asarray(idx))


def simclutter_datasets(key, *, low_snr: int = 0, high_snr: int = 2,
                        train_frac: float = 0.9,
                        source: Optional[ArrayDataset] = None,
                        frames_per_level: int = 150, crop: int = 224,
                        bg: str = "rayleigh", equal_split: bool = False):
    """(train, test) ArrayDatasets for the simclutter workload.

    With no ``source``, generates the clutter dataset on device (the
    levels are restricted to [low_snr, high_snr] — generating then
    discarding the rest would be wasted FLOPs). ``bg`` selects the clutter
    family ("rayleigh" or "k"), mirroring the reference's bg_type
    (Rayleigh_bg_Gaussian_EOT_generator_20230208.py:251-275).

    ``equal_split=True`` splits 90/10 *per SNR level* and concatenates —
    the reference's equalized-distribution loader
    (``make_dataloader_eq_dist_in_snr_range``,
    dataloader/simbg4onet_20230209.py:242-288), which guarantees every
    level appears in both splits at exactly ``train_frac``. The default
    global shuffled split matches ``make_dataloader_snr_range`` (:290-359).
    """
    k_gen, k_split = jax.random.split(key)
    if source is None:
        levels = tuple(range(low_snr, high_snr + 1))
        raw = generate_rayleigh_dataset(k_gen, levels=levels,
                                        frames_per_level=frames_per_level,
                                        crop=crop, bg=bg)
        ds = ArrayDataset(dict(raw))
    else:
        ds = filter_by_snr_range(source, low_snr, high_snr)
    # loader-level per-frame normalization (reference re-normalizes even
    # already-normalized frames; idempotent for generated data)
    ds = ArrayDataset({**ds.data, "imgs": minmax_per_frame(ds["imgs"])})
    if not equal_split:
        return train_test_split(ds, k_split, train_frac)
    trains, tests = [], []
    for i, lvl in enumerate(sorted(set(np.asarray(ds["psnr"]).tolist()))):
        sub = filter_by_snr_range(ds, int(lvl), int(lvl))
        tr, te = train_test_split(sub, jax.random.fold_in(k_split, i),
                                  train_frac)
        trains.append(tr)
        tests.append(te)

    def _cat(parts):
        return ArrayDataset({k: jnp.concatenate([p[k] for p in parts])
                             for k in parts[0].data})

    return _cat(trains), _cat(tests)
