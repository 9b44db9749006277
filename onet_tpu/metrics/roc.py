"""ROC analysis for the projection-map detector.

The reference detects via argmax over the two branch projections
(Onet_vanilla_20240606.py:185-189) — ONE fixed operating point. For radar
detection the operating point should be chosen on a false-alarm budget:
this module sweeps a threshold over the foreground-branch score map
(score = V_fg - V_bg per pixel) and reports (far, dr) pairs, plus the
threshold achieving a requested FAR (CFAR-style, calibrated on the
evaluation clutter itself). Additive over the reference surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fg_score(vt: jnp.ndarray, vd: jnp.ndarray, fg_is_down: bool):
    """Per-pixel detector score: foreground-branch logit minus background's
    (argmax(pred==fg) == score > 0, so threshold 0 reproduces argmax)."""
    return (vd - vt) if fg_is_down else (vt - vd)


def roc_points(score: jnp.ndarray, labels: jnp.ndarray, n: int = 64):
    """(far, dr, thresholds) arrays over n quantile-spaced thresholds.

    score, labels: [B, H, W]; labels binary with 1 = target. far is
    FP / GT-negatives, dr is TP / GT-positives (the _detection_rate /
    _false_alarm_rate conventions, utils_20231218.py:174-192).

    Thresholds are quantiles of the NEGATIVE-class scores (FAR at the
    q-quantile threshold is then directly ~1-q), with the top half of the
    grid log-spaced toward quantile 1.0: with sparse targets a uniform
    all-pixel grid resolves FAR only to ~1/n, returning NaN from dr_at_far
    on budgets like 1e-3 even though a feasible threshold exists.
    """
    s = score.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1) > 0
    neg = s[~y]
    # body: linear quantiles [0, 0.99]; tail: log-spaced 1 - 10^-k down to
    # one expected pixel (quantile 1 - 1/n_neg)
    n_body = n // 2
    qs_body = jnp.linspace(0.0, 0.99, n_body)
    k_max = jnp.log10(jnp.maximum(jnp.float32(neg.size), 100.0))
    qs_tail = 1.0 - 10.0 ** (-jnp.linspace(2.0, k_max, n - n_body))
    qs = jnp.concatenate([qs_body, qs_tail])
    thr = jnp.quantile(neg, qs)
    pos = jnp.sum(y)
    neg = y.size - pos

    def at(t):
        pred = s > t
        tp = jnp.sum(pred & y)
        fp = jnp.sum(pred & ~y)
        return fp / jnp.maximum(neg, 1), tp / jnp.maximum(pos, 1)

    far, dr = jax.vmap(at)(thr)
    return far, dr, thr


def dr_at_far(score: jnp.ndarray, labels: jnp.ndarray, far_targets,
              n: int = 512):
    """For each FAR budget, the best achievable dr (and the threshold).

    Returns {far_target: (achieved_far, dr, threshold)} using the finest
    threshold whose far <= target (monotone in the threshold sweep).
    """
    far, dr, thr = roc_points(score, labels, n)
    out = {}
    for tgt in far_targets:
        ok = far <= tgt
        # far decreases as the threshold rises; pick the smallest threshold
        # (highest dr) that satisfies the budget
        idx = jnp.argmax(ok)  # first True in threshold order
        any_ok = jnp.any(ok)
        out[float(tgt)] = (
            float(jnp.where(any_ok, far[idx], jnp.nan)),
            float(jnp.where(any_ok, dr[idx], jnp.nan)),
            float(jnp.where(any_ok, thr[idx], jnp.nan)),
        )
    return out
