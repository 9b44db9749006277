"""Metric parity against a direct numpy/scipy re-statement of the reference
semantics (utils_20231218.py:100-256,360-453)."""

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from onet_tpu.metrics import (
    accuracy, miou, target_iou, detection_rate, false_alarm_rate,
    evaluate_binary_segmentation, align_labels_by_accuracy,
    align_labels_hungarian, psnr_snr,
)

EPS = np.spacing(1)


def np_miou(pred, tgt):
    total, n = 0.0, 0
    for k in (0, 1):
        g = tgt == k
        p = pred == k
        if g.sum() == 0 and p.sum() == 0:
            total += 1.0
        elif g.sum() == 0 or p.sum() == 0:
            total += 0.0
        else:
            total += np.logical_and(g, p).sum() / np.logical_or(g, p).sum()
        n += 1
    return total / n


def np_bundle(pred, tgt):
    acc = (pred == tgt).mean()
    tp = ((pred == 1) & (tgt == 1)).sum()
    dr = tp / ((tgt == 1).sum() + EPS)
    far = ((pred == 1) & (tgt == 0)).sum() / ((tgt == 0).sum() + EPS)
    ti = np.logical_and(pred, tgt).sum() / (np.logical_or(pred, tgt).sum() + EPS)
    return acc, np_miou(pred, tgt), dr, far, ti


def cases(rng):
    hw = (3, 16, 16)
    yield (rng.random(hw) > 0.5).astype(np.int32), (rng.random(hw) > 0.5).astype(np.int32)
    yield np.zeros(hw, np.int32), (rng.random(hw) > 0.9).astype(np.int32)  # empty pred fg
    yield (rng.random(hw) > 0.1).astype(np.int32), np.ones(hw, np.int32)   # near-full
    yield np.zeros(hw, np.int32), np.zeros(hw, np.int32)                   # all empty
    yield np.ones(hw, np.int32), np.ones(hw, np.int32)


def test_metric_bundle_matches_numpy(rng):
    for pred, tgt in cases(rng):
        got = evaluate_binary_segmentation(jnp.asarray(pred), jnp.asarray(tgt))
        acc, mi, dr, far, ti = np_bundle(pred, tgt)
        np.testing.assert_allclose(float(got["acc"]), acc, atol=1e-6)
        np.testing.assert_allclose(float(got["miou"]), mi, atol=1e-6)
        np.testing.assert_allclose(float(got["dr"]), dr, atol=1e-6)
        np.testing.assert_allclose(float(got["far"]), far, atol=1e-6)
        np.testing.assert_allclose(float(got["tiou"]), ti, atol=1e-6)
        np.testing.assert_allclose(float(accuracy(jnp.asarray(pred), jnp.asarray(tgt))), acc, atol=1e-6)
        np.testing.assert_allclose(float(miou(jnp.asarray(pred), jnp.asarray(tgt))), mi, atol=1e-6)
        np.testing.assert_allclose(float(detection_rate(jnp.asarray(pred), jnp.asarray(tgt))), dr, atol=1e-6)
        np.testing.assert_allclose(float(false_alarm_rate(jnp.asarray(pred), jnp.asarray(tgt))), far, atol=1e-6)
        np.testing.assert_allclose(float(target_iou(jnp.asarray(pred), jnp.asarray(tgt))), ti, atol=1e-6)


def test_hungarian_flip_equivalence(rng):
    """K=2 Hungarian over the confusion matrix == keep-or-swap with
    identity kept on ties — verified against scipy directly."""
    for trial in range(20):
        pred = (rng.random((8, 8)) > rng.random()).astype(np.int64)
        tgt = (rng.random((8, 8)) > rng.random()).astype(np.int64)
        fp, ft = pred.ravel(), tgt.ravel()
        ncorrect = np.zeros((2, 2))
        for c1 in range(2):
            for c2 in range(2):
                ncorrect[c1, c2] = ((fp == c1) & (ft == c2)).sum()
        keep = ncorrect[0, 0] + ncorrect[1, 1]
        swap = ncorrect[0, 1] + ncorrect[1, 0]
        if keep == swap:
            # scipy's tie-break is implementation-defined; ours keeps
            # identity — assert that documented behavior instead.
            got = np.asarray(align_labels_hungarian(jnp.asarray(pred), jnp.asarray(tgt)))
            np.testing.assert_array_equal(got, pred)
            continue
        rows, cols = linear_sum_assignment(fp.size - ncorrect)
        expected = np.zeros_like(fp)
        for r, c in zip(rows, cols):
            expected[fp == r] = c
        got = np.asarray(align_labels_hungarian(jnp.asarray(pred), jnp.asarray(tgt)))
        np.testing.assert_array_equal(got.ravel(), expected)


def test_flip_by_accuracy(rng):
    pred = (rng.random((8, 8)) > 0.5).astype(np.int32)
    tgt = 1 - pred  # flipped version is perfect
    got = np.asarray(align_labels_by_accuracy(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_array_equal(got, tgt)
    # strictly-greater semantics: equal accuracy keeps the original
    pred2 = np.array([[0, 1], [0, 1]], np.int32)
    tgt2 = np.array([[0, 0], [1, 1]], np.int32)  # both orientations give 0.5
    got2 = np.asarray(align_labels_by_accuracy(jnp.asarray(pred2), jnp.asarray(tgt2)))
    np.testing.assert_array_equal(got2, pred2)


def test_psnr_snr(rng):
    img = rng.random((16, 16)).astype(np.float32)
    lab = np.zeros((16, 16), np.float32)
    lab[4:8, 4:8] = 1
    p, s = psnr_snr(jnp.asarray(img), jnp.asarray(lab))
    tgt = img * lab
    peak = tgt.max()
    tpow = (tgt ** 2).sum() / lab.sum()
    back = img - tgt
    erc = (back ** 2).sum() / (img.size - lab.sum())
    np.testing.assert_allclose(float(p), 10 * np.log10(peak ** 2 / erc), rtol=1e-5)
    np.testing.assert_allclose(float(s), 10 * np.log10(tpow / erc), rtol=1e-5)
