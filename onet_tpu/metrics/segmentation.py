"""Segmentation metrics, fully on device.

Behavior parity with the reference metric bundle (utils_20231218.py):

* ``accuracy``            — _acc, (TP+TN)/N (:100-117)
* ``miou``                — _miou with the empty-class conventions: both
  empty -> 1, exactly one empty -> 0, else IoU; mean over the 2 classes
  (:119-154)
* ``target_iou``          — _target_iou, foreground IoU with np.spacing(1)
  epsilon (:156-172)
* ``detection_rate``      — _detection_rate, TP / GT-positives (:174-185)
* ``false_alarm_rate``    — _false_alarm_rate, FP / GT-negatives (:187-192)
* ``evaluate_binary_segmentation`` — the (acc, miou, dr, far, t_iou)
  bundle of evaluate_nau_segmentation_v2 (:213-234)
* ``align_labels_by_accuracy`` — re_assign_label's hard flip test: keep the
  prediction unless the channel-flipped version scores STRICTLY higher
  accuracy (:410-453)
* ``align_labels_hungarian`` — reorder_segmentation (:360-375). For K=2 the
  Hungarian assignment over the confusion matrix reduces exactly to
  "identity unless the swap has more agreement" (2x2 assignment = keep or
  swap), with identity kept on exact ties. No host scipy round-trip —
  this ran on CPU every epoch in the reference (a per-epoch host sync the
  TPU build eliminates).
* ``psnr_snr``            — get_psnr peak/region SNR (:236-256)

All functions take {0,1} label maps of any matching shape and reduce over
every element (the reference flattens batches before computing, so batch
metrics here pass the whole [B, H, W] block).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

EPS = float(np.spacing(1.0))


def _counts(pred: jnp.ndarray, target: jnp.ndarray):
    p = pred.astype(jnp.bool_)
    t = target.astype(jnp.bool_)
    tp = jnp.sum(p & t)
    fp = jnp.sum(p & ~t)
    fn = jnp.sum(~p & t)
    tn = jnp.sum(~p & ~t)
    return tp, fp, fn, tn


def accuracy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred == target).astype(jnp.float32))


def miou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """2-class mean IoU with the reference's empty-class conventions."""
    tp, fp, fn, tn = _counts(pred, target)

    def class_iou(inter, union, gt_n, pd_n):
        both_empty = (gt_n == 0) & (pd_n == 0)
        one_empty = ((gt_n == 0) ^ (pd_n == 0))
        iou = inter.astype(jnp.float32) / jnp.maximum(union, 1).astype(jnp.float32)
        return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, iou))

    fg = class_iou(tp, tp + fp + fn, tp + fn, tp + fp)
    bg = class_iou(tn, tn + fn + fp, tn + fp, tn + fn)
    return (fg + bg) / 2.0


def target_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    tp, fp, fn, _ = _counts(pred, target)
    return tp.astype(jnp.float32) / ((tp + fp + fn).astype(jnp.float32) + EPS)


def detection_rate(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    tp, _, fn, _ = _counts(pred, target)
    return tp.astype(jnp.float32) / ((tp + fn).astype(jnp.float32) + EPS)


def false_alarm_rate(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    _, fp, _, tn = _counts(pred, target)
    return fp.astype(jnp.float32) / ((fp + tn).astype(jnp.float32) + EPS)


def evaluate_binary_segmentation(pred: jnp.ndarray, target: jnp.ndarray):
    """The (acc, miou, dr, far, t_iou) bundle. One fused reduction pass."""
    tp, fp, fn, tn = _counts(pred, target)
    tpf, fpf, fnf, tnf = (x.astype(jnp.float32) for x in (tp, fp, fn, tn))
    n = tpf + fpf + fnf + tnf
    acc = (tpf + tnf) / n
    dr = tpf / (tpf + fnf + EPS)
    far = fpf / (fpf + tnf + EPS)
    tiou = tpf / (tpf + fpf + fnf + EPS)

    def class_iou(inter, union, gt_n, pd_n):
        both_empty = (gt_n == 0) & (pd_n == 0)
        one_empty = (gt_n == 0) ^ (pd_n == 0)
        iou = inter / jnp.maximum(union, EPS)
        return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, iou))

    m = (class_iou(tpf, tpf + fpf + fnf, tpf + fnf, tpf + fpf)
         + class_iou(tnf, tnf + fnf + fpf, tnf + fpf, tnf + fnf)) / 2.0
    return {"acc": acc, "miou": m, "dr": dr, "far": far, "tiou": tiou}


def align_labels_by_accuracy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Hard flip test (re_assign_label): flip iff flipped accuracy is
    STRICTLY higher than the original's."""
    acc_keep = accuracy(pred, target)
    acc_flip = accuracy(1 - pred, target)
    return jnp.where(acc_keep < acc_flip, 1 - pred, pred)


def align_labels_hungarian(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Hungarian label matching for K=2 == keep-or-swap by agreement count.

    On exact agreement ties we deterministically keep the identity
    permutation (scipy's tie-break is implementation-defined; ties are
    measure-zero on real data and accuracy is orientation-invariant there).
    """
    agree_keep = jnp.sum((pred == target))
    agree_swap = jnp.sum(((1 - pred) == target))
    return jnp.where(agree_swap > agree_keep, 1 - pred, pred)


def psnr_snr(img: jnp.ndarray, label: jnp.ndarray):
    """Peak & region SNR of the labelled foreground vs background energy."""
    lab = label.astype(img.dtype)
    tgt = img * lab
    n_t = jnp.sum(lab)
    peak = jnp.max(tgt)
    p_t = jnp.sum(jnp.square(tgt)) / (n_t + EPS)
    back = img - tgt
    erc = jnp.sum(jnp.square(back)) / (img.size - n_t + EPS)
    psnr = 10.0 * jnp.log10(jnp.square(peak) / erc)
    snr = 10.0 * jnp.log10(p_t / erc)
    return psnr, snr


def reorder_by_intensity(pred: jnp.ndarray, echos: jnp.ndarray,
                         num_k: int = 2) -> jnp.ndarray:
    """Intensity-ranked label reordering (reference reorder_pred_label,
    utils_20231218.py:287-313): rank the predicted regions by summed echo
    intensity; least-intense region -> 0 (background), most-intense -> 1
    (sea clutter), and for num_k == 3 the middle region -> 2 (object)."""
    sums = jnp.stack([jnp.sum(jnp.where(pred == c, echos, 0.0))
                      for c in range(num_k)])
    order = jnp.argsort(sums)  # ascending region intensity
    out = jnp.zeros_like(pred)
    out = jnp.where(pred == order[0], 0, out)
    if num_k == 2:
        out = jnp.where(pred == order[1], 1, out)
    elif num_k == 3:
        out = jnp.where(pred == order[2], 1, out)
        out = jnp.where(pred == order[1], 2, out)
    else:
        raise ValueError(num_k)
    return out


def reorder_by_mean_intensity(pred: jnp.ndarray,
                              echos: jnp.ndarray) -> jnp.ndarray:
    """Binary flip by REGION MEAN intensity (reorder_pred_label_v2,
    utils_20231218.py:194-211): if predicted-background pixels are on
    average brighter than predicted-foreground ones, swap the labels."""
    n0 = jnp.maximum(jnp.sum(pred == 0), 1)
    n1 = jnp.maximum(jnp.sum(pred == 1), 1)
    m0 = jnp.sum(jnp.where(pred == 0, echos, 0.0)) / n0
    m1 = jnp.sum(jnp.where(pred == 1, echos, 0.0)) / n1
    return jnp.where(m0 > m1, 1 - pred, pred)


def evaluate_with_intensity_reorder(pred: jnp.ndarray, target: jnp.ndarray,
                                    echos: jnp.ndarray, num_k: int = 3):
    """Legacy 3-class radar eval (evaluate_nau_segmentation,
    utils_20231218.py:316-358): rank regions by intensity, coarsely merge
    the middle 'object' region into sea clutter, then score acc / miou."""
    sums = jnp.stack([jnp.sum(jnp.where(pred == c, echos, 0.0))
                      for c in range(num_k)])
    order = jnp.argsort(sums)
    out = jnp.zeros_like(pred)
    out = jnp.where(pred == order[0], 0, out)
    out = jnp.where(pred == order[num_k - 1], 1, out)
    if num_k == 3:
        out = jnp.where(pred == order[1], 1, out)  # object -> sea clutter
    return accuracy(out, target), miou(out, target)
