"""Workload 3: zero-shot transfer to NAU marine-radar rain clutter.

Reference: exp_nau_rain_20240513.py:40-76 (test_naurain_onet) — load the
simclutter-trained checkpoint, run inference on real radar frames, report
(acc, miou, dr, far, tiou) with flip-test alignment plus the input
psnr/snr, and measure_snr_on_fg (Train_Onet_on_simclutter_20250407.py:46-95)
— SNR improvement of the segmented-foreground projection map over the
input.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.arrays import ArrayDataset, batch_iterator
from onet_tpu.metrics.segmentation import (
    align_labels_by_accuracy, evaluate_binary_segmentation, psnr_snr)
from onet_tpu.models.onet import onet_forward, predict_label
from onet_tpu.ops.normalize import minmax_per_frame


def make_transfer_eval(*, policy: Policy = DEFAULT, forward=None):
    """``forward`` swaps the backbone (models/arch.py registry — every
    family keeps the OnetOutput contract); default is the vanilla conv
    U-Net."""
    fwd = forward or onet_forward

    @jax.jit
    def eval_batch(params, bn_state, x, labels):
        out, _ = fwd(params, bn_state, x, train=False, policy=policy)
        raw = predict_label(out.S)
        pred = align_labels_by_accuracy(raw, labels)
        metrics = evaluate_binary_segmentation(pred, labels)
        in_psnr, in_snr = psnr_snr(x[..., 0], labels)

        # segmented-foreground SNR (measure_snr_on_fg): the projection map
        # of whichever branch carries the foreground, per-frame normalized
        flipped = jnp.any(raw != pred)
        vt = minmax_per_frame(out.Vt[..., None])[..., 0]
        vd = minmax_per_frame(out.Vd[..., None])[..., 0]
        fg = jnp.where(flipped, vt, vd)
        fg_psnr, fg_snr = psnr_snr(fg, labels)
        return metrics, (in_psnr, in_snr, fg_psnr, fg_snr), pred, (vt, vd)

    return eval_batch


def test_naurain(params, bn_state, test_ds: ArrayDataset, *,
                 batch_sz: int = 5, policy: Policy = DEFAULT,
                 ids=None, fig_path: str = None, forward=None) -> Dict:
    """Transfer eval; with ``fig_path`` also dumps the show_nau_rain grid
    (echo/gt/pred/Vt/Vd columns titled by frame name,
    utils_20231218.py:595-620) for the first batch."""
    eval_batch = make_transfer_eval(policy=policy, forward=forward)
    sums, snrs, n = None, np.zeros(4), 0
    first = None
    for batch in batch_iterator(test_ds, batch_sz):
        metrics, snr4, pred, vtvd = eval_batch(params, bn_state,
                                               batch["imgs"],
                                               batch["labels"])
        if first is None:
            first = (batch, pred, vtvd)
        metrics = {k: float(v) for k, v in metrics.items()}
        sums = metrics if sums is None else {k: sums[k] + metrics[k]
                                             for k in metrics}
        snrs += np.array([float(v) for v in snr4])
        n += 1
    out = {k: v / n for k, v in sums.items()}
    out.update(zip(("input_psnr", "input_snr", "fg_psnr", "fg_snr"), snrs / n))
    if fig_path and first is not None:
        from onet_tpu.report.curves import save_nau_rain_grid
        batch, pred, (vt, vd) = first
        save_nau_rain_grid(
            fig_path, np.asarray(batch["imgs"]),
            list(ids or [])[:batch["imgs"].shape[0]],
            np.asarray(vt), np.asarray(vd),
            np.asarray(batch["labels"]), np.asarray(pred),
            title="nau_rain_transfer")
    return out
