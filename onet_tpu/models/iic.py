"""IIC baseline: Invariant Information Clustering for segmentation.

The reference's united config file serves FOUR model families — "Onet,
Infoseg, IIC and supervised Unet" (configs/config_tip2022_20230411.py:2)
— and carries a dedicated IIC config path (``setup_config_IIC``, :46-100,
mirrored by ``core/config.py::setup_config_iic``); the IIC model module
itself is absent from the snapshot. Like the InfoSeg baseline
(models/infoseg.py), this is an independent TPU-native implementation of
the published method (Ji, Henriques & Vedaldi, ICCV 2019, "Invariant
Information Clustering for Unsupervised Image Classification and
Segmentation", §3.3 segmentation variant): two views of each frame — the
original and a randomly flipped/shifted/intensity-jittered copy — are
pushed through the same per-pixel K-way softmax head; the transformed
view's assignment map is geometrically inverted back; the K x K joint
distribution is accumulated over batch, pixels and a small displacement
window T; and the mutual information of that joint is maximized. An
auxiliary OVERCLUSTERING head (more clusters than ground-truth classes,
the paper's §3.2 trick for noisy data) trains on the same views and is
discarded at inference.

TPU design notes:
* one fused forward per view — the two views ride the batch dimension
  through the same conv trunk (one [2N, H, W, C] pass, MXU-friendly),
* the displacement window is a statically-unrolled set of ``jnp.roll``
  shifts with wrap-validity masks — the whole joint is (2r+1)^2 einsum
  contractions, no gather loops, shapes static at every eval size,
* the geometric inverse (un-flip, un-shift) happens on the PROBABILITY
  maps with iota-built validity masks, so every pixel pair entering the
  joint saw real data in both views (zero-fill edge bands are masked).

API mirrors the reference's baseline usage (exp_nau_rain_20240513.py
evaluates snapshot-absent baselines by ``get_label``-style argmax maps):
``iic_init``, ``iic_forward`` -> per-pixel probs, ``get_label``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L

# IIC eq. (3): I_lambda(P) = sum_ij P_ij (log P_ij - lam*log Pi - lam*log Pj).
# lam = 1 is plain MI; the paper notes lam > 1 trades against cluster
# collapse. Kept at the published default.
LAMBDA = 1.0
EPS = 1e-9


class IICOut(NamedTuple):
    probs: jnp.ndarray      # [N, H, W, K] main-head soft assignment
    probs_aux: jnp.ndarray  # [N, H, W, K_aux] overclustering head


# ---------------------------------------------------------------------------
# init / apply — same two-scale FCN trunk idiom as models/infoseg.py
# ---------------------------------------------------------------------------

def _conv_bn_init(key, cin, cout, dtype):
    p, s = L.bn_init(cout, dtype)
    return ({"w": L.kaiming_normal_conv(key, 3, 3, cin, cout, dtype)},
            p, s)


def iic_init(key, in_channels: int = 1, k_classes: int = 2, *,
             k_aux: int = 6, base: int = 64, dtype=jnp.float32):
    """(params, state) for the IIC trunk + main and overclustering heads."""
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
    params["head_aux"] = {
        "w": jax.random.normal(keys[6], (base, k_aux), dtype)
        * jnp.sqrt(2.0 / base),
        "b": jnp.zeros((k_aux,), dtype)}
    return params, state


def _conv_bn_relu(x, w, bn_p, bn_s, *, train, policy):
    y = L.conv3x3(x, w["w"], policy=policy)
    y, ns = L.batch_norm(y, bn_p, bn_s, train=train)
    return jax.nn.relu(y), ns


def iic_forward(params, state, x, *, train: bool = False,
                policy: Policy = DEFAULT):
    """Apply IIC to [N, H, W, C]; returns (IICOut, new_state)."""
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
    c = jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    c = jnp.pad(c, ((0, 0), (0, h - c.shape[1]), (0, w - c.shape[2]),
                    (0, 0)), mode="edge")[:, :h, :w]
    ctx = (c.astype(jnp.float32) @ params["proj"]["w"].astype(jnp.float32)
           + params["proj"]["b"].astype(jnp.float32))
    feats = y.astype(jnp.float32) + ctx
    probs = jax.nn.softmax(
        feats @ params["head"]["w"].astype(jnp.float32)
        + params["head"]["b"].astype(jnp.float32), axis=-1)
    probs_aux = jax.nn.softmax(
        feats @ params["head_aux"]["w"].astype(jnp.float32)
        + params["head_aux"]["b"].astype(jnp.float32), axis=-1)
    return IICOut(probs, probs_aux), ns


def get_label(probs: jnp.ndarray) -> jnp.ndarray:
    """Argmax class map from the main head (baseline eval convention)."""
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# paired views: g = flip / integer shift / intensity jitter, and its inverse
# ---------------------------------------------------------------------------

class PairMeta(NamedTuple):
    flip_h: jnp.ndarray   # [N] bool
    flip_v: jnp.ndarray   # [N] bool
    dy: jnp.ndarray       # [N] int32 in [-max_shift, max_shift]
    dx: jnp.ndarray       # [N] int32


def iic_pair_transform(key, x, *, max_shift: int = 2,
                       gain: float = 0.2):
    """The random photometric+geometric view g(x): per-image horizontal /
    vertical flips, integer translation (zero-fill, like the published
    affine+pad; the fill bands are masked out of the joint) and
    multiplicative intensity jitter — the clutter-appropriate
    instantiation of IIC's "random transformations"."""
    kf, kv, ky, kx, kg = jax.random.split(key, 5)
    n = x.shape[0]
    s = int(max_shift)
    meta = PairMeta(
        jax.random.bernoulli(kf, 0.5, (n,)),
        jax.random.bernoulli(kv, 0.5, (n,)),
        jax.random.randint(ky, (n,), -s, s + 1),
        jax.random.randint(kx, (n,), -s, s + 1))
    g = 1.0 + gain * (2.0 * jax.random.uniform(kg, (n, 1, 1, 1)) - 1.0)
    h, w = x.shape[1], x.shape[2]

    def one(img, fh, fv, dy, dx):
        img = jnp.where(fh, img[:, ::-1], img)
        img = jnp.where(fv, img[::-1], img)
        padded = jnp.pad(img, ((s, s), (s, s), (0, 0)))
        # x2[r] = img[r - dy] where in range, else 0
        return jax.lax.dynamic_slice(
            padded, (s - dy, s - dx, 0), (h, w, img.shape[-1]))

    x2 = jax.vmap(one)(x, meta.flip_h, meta.flip_v, meta.dy, meta.dx)
    return jnp.clip(x2 * g, 0.0, 1.0), meta


def iic_undo_geometry(probs2, meta: PairMeta):
    """g^-1 on the transformed view's assignment maps, with a validity
    mask killing the translation wrap bands — aligned so pixel u of view 1
    faces pixel u of view 2 (IIC eq. (5) pairs Phi(x)[u] with
    [g^-1 Phi(gx)][u])."""
    h, w = probs2.shape[1], probs2.shape[2]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]

    def one(p, fh, fv, dy, dx):
        p = jnp.roll(p, (-dy, -dx), axis=(0, 1))
        # aligned position u maps to view-2 row u+dy, valid only where
        # that row existed AND saw real (non-fill) content:
        # u ∈ [max(-dy, 0), h - max(dy, 0))
        vr = (rows >= jnp.maximum(-dy, 0)) & (rows < h - jnp.maximum(dy, 0))
        vc = (cols >= jnp.maximum(-dx, 0)) & (cols < w - jnp.maximum(dx, 0))
        p = jnp.where(fv, p[::-1], p)
        p = jnp.where(fh, p[:, ::-1], p)
        m = (vr & vc).astype(jnp.float32)
        m = jnp.where(fv, m[::-1], m)
        m = jnp.where(fh, m[:, ::-1], m)
        return p, m

    p2, mask = jax.vmap(one)(probs2, meta.flip_h, meta.flip_v,
                             meta.dy, meta.dx)
    return p2, mask[..., None]


# ---------------------------------------------------------------------------
# loss — displacement-window joint + mutual information (IIC eq. (3)/(5))
# ---------------------------------------------------------------------------

def _shift_valid(h, w, dy: int, dx: int):
    """Static mask of pixels whose jnp.roll(dy, dx) source didn't wrap."""
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    vr = (rows >= max(dy, 0)) & (rows < h + min(dy, 0))
    vc = (cols >= max(dx, 0)) & (cols < w + min(dx, 0))
    return (vr & vc).astype(jnp.float32)[None, :, :, None]


def iic_joint(p1, p2, mask, *, radius: int = 1):
    """The K x K' joint: sum over batch, pixels and the displacement
    window T = [-r, r]^2 of p1[u] (x) p2[u + t], validity-masked and
    symmetrized+normalized (paper eq. (5): average the joint over g and
    t, then one MI)."""
    h, w = p1.shape[1], p1.shape[2]
    joint = jnp.zeros((p1.shape[-1], p2.shape[-1]), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            p2s = jnp.roll(p2, (dy, dx), axis=(1, 2))
            m2s = jnp.roll(mask, (dy, dx), axis=(1, 2))
            # p1 is untransformed (always valid); the pair (u, u-t) needs
            # view-2 validity at the shifted position and no roll wrap
            wgt = m2s * _shift_valid(h, w, dy, dx)
            joint = joint + jnp.einsum("nhwk,nhwl->kl", p1 * wgt, p2s)
    joint = joint / jnp.maximum(jnp.sum(joint), EPS)
    return joint


def mutual_information(joint, *, lam: float = LAMBDA):
    """I_lambda of a normalized joint. Square joints — both the main
    K x K and the aux K_aux x K_aux (each head pairs with ITSELF across
    views) — are symmetrized first (paper §3.1); the shape guard only
    spares hypothetical cross-head rectangular joints."""
    if joint.shape[0] == joint.shape[1]:
        joint = (joint + joint.T) / 2.0
    pi = jnp.sum(joint, axis=1, keepdims=True)
    pj = jnp.sum(joint, axis=0, keepdims=True)
    return jnp.sum(joint * (jnp.log(joint + EPS)
                            - lam * jnp.log(pi + EPS)
                            - lam * jnp.log(pj + EPS)))


def compute_iic_loss(out1: IICOut, out2_aligned: IICOut, mask, *,
                     radius: int = 1, lam: float = LAMBDA,
                     aux_weight: float = 1.0):
    """-I(main) - aux_weight * I(aux): both heads see the same view pair
    (the paper alternates head updates epoch-wise; a weighted sum is the
    jit-friendly equivalent — one compiled graph, same gradients up to
    the schedule)."""
    main = mutual_information(
        iic_joint(out1.probs, out2_aligned.probs, mask, radius=radius),
        lam=lam)
    aux = mutual_information(
        iic_joint(out1.probs_aux, out2_aligned.probs_aux, mask,
                  radius=radius), lam=lam)
    return -(main + aux_weight * aux)
