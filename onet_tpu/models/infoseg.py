"""InfoSeg baseline: unsupervised segmentation by local-global MI maximization.

The reference's NAU comparison figures evaluate an ``Infoseg`` model
(``exp_nau_rain_20240513.py:319-323,364-367``: ``Infoseg(input_channels, K,
height, width)``, forward ``L, S, V = infoseg(X1)``, labels via
``infoseg.get_label(V)``, trained on the simulated-clutter set per the
module name ``InfoSeg_Simbg_20230527`` — the module itself is absent from
the snapshot, SURVEY §2.9). This is an independent TPU-native
implementation of the published InfoSeg method (Harb & Knöbelreiter,
GCPR 2021): per-pixel *local* features, per-class *global* features pooled
by the soft assignment, and a Jensen-Shannon mutual-information bound
between the two, maximized end-to-end. Differences from the (unseen)
reference module are possible by construction; the API surface and the
training set match the reference's usage.

TPU design notes:
* fully-convolutional two-scale encoder (full-res + pooled context) —
  all 3x3 convs ride the MXU, shapes static at every eval size;
* global features are one ``einsum`` contraction; the MI critic is a
  single ``[N*H*W, D] x [D, M*K]`` matmul against ALL images' class
  features — positives and negatives come out of the same product, so the
  loss adds one MXU op instead of a sampling loop;
* the forward returns the reference's ``(L, S, V)`` tuple shape: class
  logits, local<->global similarity scores, and per-pixel class
  probabilities (``get_label`` argmaxes V, matching ``get_label(V)``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L
from onet_tpu.ops.math import log1pexp

TAU = 0.5          # critic temperature on unit-norm features
# Marginal-entropy weight: a mild collapse guard only. Strong weights force
# a balanced class split, which is wrong for sparse targets (measured on the
# toy problem: W=2.0 -> far 0.44; W=0.1 -> far 0.20 at dr 1.0; W=0 is best
# but can collapse to one class on hard data).
ENTROPY_W = 0.1


class InfoSegOut(NamedTuple):
    logits: jnp.ndarray   # [N, H, W, K] class-head logits ("L")
    scores: jnp.ndarray   # [N, H, W, K] local-global critic scores ("S")
    probs: jnp.ndarray    # [N, H, W, K] soft assignment ("V")
    feats: jnp.ndarray    # [N, H, W, D] local features (loss input)
    glob: jnp.ndarray     # [N, K, D] class-pooled global features


# ---------------------------------------------------------------------------
# init / apply
# ---------------------------------------------------------------------------

def _conv_bn_init(key, cin, cout, dtype):
    p, s = L.bn_init(cout, dtype)
    return ({"w": L.kaiming_normal_conv(key, 3, 3, cin, cout, dtype)},
            p, s)


def infoseg_init(key, in_channels: int = 1, k_classes: int = 2, *,
                 base: int = 64, dtype=jnp.float32):
    """(params, state) for the two-scale InfoSeg encoder + class head."""
    keys = jax.random.split(key, 7)
    params, state = {}, {}
    for name, (kk, cin, cout) in {
        "enc1": (keys[0], in_channels, base),
        "enc2": (keys[1], base, base),
        "ctx1": (keys[2], base, 2 * base),
        "ctx2": (keys[3], 2 * base, 2 * base),
    }.items():
        w, bp, bs = _conv_bn_init(kk, cin, cout, dtype)
        params[name], params[f"{name}_bn"], state[f"{name}_bn"] = w, bp, bs
    fan = 2 * base
    params["proj"] = {
        "w": jax.random.normal(keys[4], (2 * base, base), dtype)
        * jnp.sqrt(2.0 / fan),
        "b": jnp.zeros((base,), dtype)}
    params["head"] = {
        "w": jax.random.normal(keys[5], (base, k_classes), dtype)
        * jnp.sqrt(2.0 / base),
        "b": jnp.zeros((k_classes,), dtype)}
    return params, state


def _conv_bn_relu(x, w, bn_p, bn_s, *, train, policy):
    y = L.conv3x3(x, w["w"], policy=policy)
    y, ns = L.batch_norm(y, bn_p, bn_s, train=train)
    return jax.nn.relu(y), ns


def infoseg_forward(params, state, x, *, train: bool = False,
                    policy: Policy = DEFAULT):
    """Apply InfoSeg to [N, H, W, C]; returns (InfoSegOut, new_state)."""
    ns = dict(state)
    y, ns["enc1_bn"] = _conv_bn_relu(x, params["enc1"], params["enc1_bn"],
                                     state["enc1_bn"], train=train,
                                     policy=policy)
    y, ns["enc2_bn"] = _conv_bn_relu(y, params["enc2"], params["enc2_bn"],
                                     state["enc2_bn"], train=train,
                                     policy=policy)
    h, w = y.shape[1], y.shape[2]
    c = L.max_pool_2x2(y[:, :h // 2 * 2, :w // 2 * 2])
    c, ns["ctx1_bn"] = _conv_bn_relu(c, params["ctx1"], params["ctx1_bn"],
                                     state["ctx1_bn"], train=train,
                                     policy=policy)
    c, ns["ctx2_bn"] = _conv_bn_relu(c, params["ctx2"], params["ctx2_bn"],
                                     state["ctx2_bn"], train=train,
                                     policy=policy)
    # nearest 2x upsample back to full res (odd sizes: pad-crop to match)
    c = jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    c = jnp.pad(c, ((0, 0), (0, h - c.shape[1]), (0, w - c.shape[2]),
                    (0, 0)), mode="edge")[:, :h, :w]
    ctx = (c.astype(jnp.float32) @ params["proj"]["w"].astype(jnp.float32)
           + params["proj"]["b"].astype(jnp.float32))
    feats = y.astype(jnp.float32) + ctx                     # [N, H, W, D]
    logits = (feats @ params["head"]["w"].astype(jnp.float32)
              + params["head"]["b"].astype(jnp.float32))    # [N, H, W, K]
    probs = jax.nn.softmax(logits, axis=-1)
    # class-pooled global features: G[n,k] = sum_x P F / sum_x P
    mass = jnp.sum(probs, axis=(1, 2))                      # [N, K]
    glob = (jnp.einsum("nhwk,nhwd->nkd", probs, feats)
            / jnp.maximum(mass, 1e-6)[..., None])           # [N, K, D]
    fh = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6)
    gh = glob / jnp.maximum(
        jnp.linalg.norm(glob, axis=-1, keepdims=True), 1e-6)
    # own-image critic scores only for the "S" output (the loss recomputes
    # the full cross-image product)
    scores = jnp.einsum("nhwd,nkd->nhwk", fh, gh) / TAU
    return InfoSegOut(logits, scores, probs, fh, gh), ns


def get_label(v: jnp.ndarray) -> jnp.ndarray:
    """Argmax class map from the probability output (reference
    ``infoseg.get_label(V)``, exp_nau_rain_20240513.py:365)."""
    return jnp.argmax(v, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def compute_infoseg_loss(out: InfoSegOut):
    """JSD mutual-information bound + marginal-entropy collapse guard.

    Positives: each pixel with its own image's class features, weighted by
    the soft assignment. Negatives: the same pixel against every OTHER
    image's class features (InfoSeg pairs locals with globals of other
    samples in the batch). sp(-t) / sp(t) is the Jensen-Shannon critic.
    Requires batch >= 2 for negatives to exist.
    """
    fh, gh, probs = out.feats, out.glob, out.probs
    n, h, w, _ = fh.shape
    k = gh.shape[1]
    sim = jnp.einsum("nhwd,mkd->nhwmk", fh, gh) / TAU  # one big matmul
    own = jnp.take_along_axis(
        sim, jnp.arange(n)[:, None, None, None, None], axis=3)[:, :, :, 0]
    pos = jnp.sum(probs * own, axis=-1)                # [N, H, W]
    loss_pos = jnp.mean(log1pexp(-pos))
    if n > 1:
        neg_mask = (1.0 - jnp.eye(n))[:, None, None, :, None]
        loss_neg = (jnp.sum(log1pexp(sim) * neg_mask)
                    / (n * h * w * (n - 1) * k))
    else:
        loss_neg = 0.0
    marg = jnp.mean(probs, axis=(0, 1, 2))             # [K]
    ent = -jnp.sum(marg * jnp.log(marg + 1e-9))
    return loss_pos + loss_neg - ENTROPY_W * ent
