"""Two-stage Onet composition and per-PSNR verification sweeps.

Reference: test_2nd_stage_simclutter / verify_2nd_stage_onet
(Train_Onet_on_simclutter_20250407.py:296-418) and the single-stage sweep
verify_onet_simclutter (:420-454).

Stage 1 segments the raw frame; its foreground projection map (Vd if the
argmax labels were already GT-aligned, else Vt — :327-330) is per-frame
min-max normalized and fed to the stage-2 Onet (:332-333), which was
trained on the high-SNR regime. Metrics are the (acc, miou, dr, far, tiou)
bundle per stage with the flip-test alignment.

TPU note: the reference branches on a host bool (torch.equal) per batch; we
select per the same predicate with jnp.where so the composition stays one
jitted graph.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.arrays import batch_iterator
from onet_tpu.metrics.segmentation import (
    align_labels_by_accuracy, evaluate_binary_segmentation)
from onet_tpu.models.onet import onet_forward, predict_label
from onet_tpu.ops.normalize import minmax_per_frame


def make_two_stage_eval(*, policy: Policy = DEFAULT):
    @jax.jit
    def eval_batch(params1, bn1, params2, bn2, x, labels):
        out1, _ = onet_forward(params1, bn1, x, train=False, policy=policy)
        raw1 = predict_label(out1.S)
        pred1 = align_labels_by_accuracy(raw1, labels)
        m1 = evaluate_binary_segmentation(pred1, labels)

        flipped = jnp.any(raw1 != pred1)
        # unchanged -> Vd carries the foreground; flipped -> Vt (:327-330)
        fg_map = jnp.where(flipped, out1.Vt, out1.Vd)
        x2 = minmax_per_frame(fg_map[..., None])
        out2, _ = onet_forward(params2, bn2, x2, train=False, policy=policy)
        raw2 = predict_label(out2.S)
        pred2 = align_labels_by_accuracy(raw2, labels)
        m2 = evaluate_binary_segmentation(pred2, labels)
        return m1, m2, pred1, pred2, (x2, fg_map)

    return eval_batch


def draw_two_stage(fig_path: str, eval_batch, params1, bn1, params2, bn2,
                   batch, title: str = "two_stage"):
    """show_unet_2ndstage_test layout (utils_20231218.py:622-641): input /
    stage-2 input / fg map / gt / stage-1 pred / stage-2 pred."""
    from onet_tpu.report.curves import save_two_stage_grid

    m1, m2, pred1, pred2, (x2, fg) = eval_batch(
        params1, bn1, params2, bn2, batch["imgs"], batch["labels"])
    return save_two_stage_grid(
        fig_path, np.asarray(batch["imgs"]), np.asarray(x2),
        np.asarray(fg[..., None]), np.asarray(batch["labels"]),
        np.asarray(pred1), np.asarray(pred2), title=title)


def verify_two_stage(params1, bn1, params2, bn2, datasets_by_psnr,
                     batch_sz: int = 10, *, policy: Policy = DEFAULT) -> Dict:
    """Per-PSNR (stage1, stage2) metric dict + 'ave' row, mirroring
    verify_2nd_stage_onet's report shape."""
    eval_batch = make_two_stage_eval(policy=policy)
    report = {}
    for psnr, ds in datasets_by_psnr.items():
        sums1, sums2, n = None, None, 0
        for batch in batch_iterator(ds, batch_sz):
            m1, m2, _, _, _ = eval_batch(params1, bn1, params2, bn2,
                                      batch["imgs"], batch["labels"])
            m1 = {k: float(v) for k, v in m1.items()}
            m2 = {k: float(v) for k, v in m2.items()}
            sums1 = m1 if sums1 is None else {k: sums1[k] + m1[k] for k in m1}
            sums2 = m2 if sums2 is None else {k: sums2[k] + m2[k] for k in m2}
            n += 1
        report[psnr] = {"stage1": {k: v / n for k, v in sums1.items()},
                        "stage2": {k: v / n for k, v in sums2.items()}}
    keys = ("acc", "miou", "dr", "far", "tiou")
    report["ave"] = {
        stage: {k: float(np.mean([report[p][stage][k]
                                  for p in report if p != "ave"]))
                for k in keys}
        for stage in ("stage1", "stage2")
    }
    return report


def verify_single_stage(eval_step, params, bn_state, datasets_by_psnr,
                        batch_sz: int = 10) -> Dict:
    """Per-PSNR sweep for one model (verify_onet_simclutter, :420-454)."""
    report = {}
    for psnr, ds in datasets_by_psnr.items():
        sums, n = None, 0
        for batch in batch_iterator(ds, batch_sz):
            metrics, _, _ = eval_step(params, bn_state, batch["imgs"],
                                      batch["labels"])
            metrics = {k: float(v) for k, v in metrics.items()}
            sums = metrics if sums is None else {k: sums[k] + metrics[k]
                                                 for k in metrics}
            n += 1
        report[psnr] = {k: v / n for k, v in sums.items()}
    keys = ("acc", "miou", "dr", "far", "tiou")
    report["ave"] = {k: float(np.mean([report[p][k] for p in report
                                       if p != "ave"])) for k in keys}
    return report
