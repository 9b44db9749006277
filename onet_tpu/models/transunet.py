"""TransUNet twin Onet — the reference's hybrid ViT backbone ablation.

The snapshot's ablation drivers import ``Onet_Trans_Unet_20240613``
alongside the Swin/ConvNeXt variants (Train_Onet_on_zy3_20240606.py:22-28;
the commented config swap at :321 picks between the transunet and swin
YAMLs) but the model module is git-absent (SURVEY.md section 2.9). Like
those families (models/swin.py, models/convnext.py), this one is rebuilt
from the published method — TransUNet (Chen et al. 2021, "TransUNet:
Transformers Make Strong Encoders for Medical Image Segmentation") —
fitted to the Onet container exactly the way the reference fits its U-Net
(Onet_vanilla_20240606.py:156-191):

* hybrid encoder: a light conv pyramid (three stride-2 conv->LN->GELU
  stages producing skips at 1/2, 1/4, 1/8 with widths D/12, D/6, D/3)
  stands in for the paper's ImageNet-pretrained ResNet-50 — no pretrained
  weights exist in this from-scratch setting, and the pyramid keeps the
  published skip resolutions; then a 2x2 patch-embed conv to hidden-D
  tokens at 1/16 (the paper's R50-ViT hybrid patchifies the 1/16 feature
  map the same way);
* ViT: ``depth`` pre-LN transformer blocks (published ViT-B geometry at
  the defaults: D=768, depth=12, heads=D/64, MLP 4x) with learned position
  embeddings sized for ``img_size`` at init and bilinearly resized for
  other grids (the standard ViT transfer rule), then a final encoder LN;
* CUP decoder (the paper's Cascaded UPsampler): conv3x3 D->D/3 on the
  token grid, then four cascaded stages of [2x bilinear upsample ->
  concat skip -> conv3x3 -> LN -> ReLU] with widths D/3, D/6, D/12, D/48
  (= the published 256/128/64/16 at D=768); the last stage has no skip
  (full resolution);
* Onet fit: ``glob`` = the final CUP features projected to 64 channels,
  ``loc`` = a full-resolution conv stem (3x3 -> LN -> GELU -> 64), head /
  losses / drivers are the unchanged Onet machinery
  (models/onet.py::stateless_onet_forward).

TPU design notes:
* LayerNorm replaces the paper's decoder BatchNorm: stateless norms make
  the weight-shared twin pass batch-stack [X; 1-X] into one [2B] pass with
  structural equivalence to sequential branch passes — the same trade the
  Swin/ConvNeXt rebuilds make;
* global attention runs on at most (H/16)(W/16) tokens (196 at 224^2,
  1024 at 512^2) — one [L, L] einsum per block, bf16 on the MXU with f32
  softmax;
* bilinear 2x upsampling lowers to a fixed 2-tap kernel in XLA; the
  pixel-shuffle alternative was kept for Swin-Unet (its published form),
  while CUP's published form is resize+conv, kept here.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models.onet import stateless_onet_forward
from onet_tpu.models.swin import (
    _dense, _layer_norm, _linear_init, _ln_init, _trunc_normal)

PATCH = 16  # total token stride: 3 pyramid halvings x 2x2 patch embed


def _conv(x, p, stride, policy: Policy, *, padding="SAME"):
    """3x3/2x2 conv + bias, compute-dtype operands and result.

    Operand/result dtypes stay equal (the conv VJP transpose is ill-typed
    with a float32 cotangent against bf16 operands — the layers.py::conv3x3
    convention); the MXU accumulates in fp32 internally either way.
    """
    y = jax.lax.conv_general_dilated(
        policy.cast_compute(x), policy.cast_compute(p["w"]),
        (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
    if "b" in p:
        y = y + policy.cast_compute(p["b"])
    return y


def _conv_init(key, kh, cin, cout, dtype=jnp.float32):
    fan_in = kh * kh * cin
    return {"w": (jax.random.normal(key, (kh, kh, cin, cout))
                  * np.sqrt(2.0 / fan_in)).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _mhsa(p, x, *, heads, policy: Policy):
    """Global multi-head self-attention over tokens. x [N, L, D]."""
    n, l, d = x.shape
    dh = d // heads
    qkv = _dense(x, p["qkv"], policy)                        # [N, L, 3D]
    qkv = qkv.reshape(n, l, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                         # [N, h, L, dh]
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k,
                      precision=policy.precision,
                      preferred_element_type=jnp.float32)
    attn = attn.astype(jnp.float32) * (dh ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(policy.compute_dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, policy.cast_compute(v),
                     precision=policy.precision,
                     preferred_element_type=jnp.float32)
    out = out.astype(policy.compute_dtype)
    out = out.transpose(0, 2, 1, 3).reshape(n, l, d)
    return _dense(out, p["proj"], policy)


def _vit_block_init(key, dim, mlp_ratio=4, dtype=jnp.float32):
    kq, kp, k1, k2 = jax.random.split(key, 4)
    return {
        "ln1": _ln_init(dim, dtype),
        "qkv": _linear_init(kq, dim, 3 * dim, dtype=dtype),
        "proj": _linear_init(kp, dim, dim, dtype=dtype),
        "ln2": _ln_init(dim, dtype),
        "fc1": _linear_init(k1, dim, mlp_ratio * dim, dtype=dtype),
        "fc2": _linear_init(k2, mlp_ratio * dim, dim, dtype=dtype),
    }


def _vit_block(p, x, *, heads, policy: Policy):
    x = x + _mhsa(p, _layer_norm(x, p["ln1"]), heads=heads, policy=policy)
    m = _dense(_layer_norm(x, p["ln2"]), p["fc1"], policy)
    m = _dense(jax.nn.gelu(m), p["fc2"], policy)
    return x + m


def _upsample2x(x):
    """2x bilinear upsampling (the published CUP stage)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def transunet_init(key, in_channels: int, *, embed_dim: int = 768,
                   depth: int = 12, img_size: int = 224,
                   out_dim: int = 64, dtype=jnp.float32):
    """Params pytree for one TransUNet (published ViT-B geometry at the
    defaults; ``embed_dim`` scales every width — it must be divisible by
    48 so the CUP widths D/3..D/48 stay integral)."""
    if embed_dim % 48:
        raise ValueError(f"embed_dim {embed_dim} must be divisible by 48 "
                         "(CUP decoder widths are D/3, D/6, D/12, D/48)")
    if img_size % PATCH:
        raise ValueError(f"img_size {img_size} must be divisible by {PATCH}")
    d = embed_dim
    d3, d6, d12, d48 = d // 3, d // 6, d // 12, d // 48
    keys = iter(jax.random.split(key, 16 + 4 * depth))
    p = {}
    # full-resolution conv stem (the Onet 'loc' path, shared convention
    # with models/swin.py and models/convnext.py)
    fan_in = 9 * in_channels
    p["stem"] = {"w": (jax.random.normal(next(keys),
                                         (3, 3, in_channels, out_dim))
                       * np.sqrt(2.0 / fan_in)).astype(dtype),
                 "ln": _ln_init(out_dim, dtype)}
    # conv pyramid: skips at 1/2 (D/12), 1/4 (D/6), 1/8 (D/3)
    widths = (d12, d6, d3)
    cin = in_channels
    for i, cout in enumerate(widths):
        p[f"pyr{i}"] = dict(_conv_init(next(keys), 3, cin, cout, dtype),
                            ln=_ln_init(cout, dtype))
        cin = cout
    # 2x2 patch embed on the 1/8 features -> tokens at 1/16
    p["embed"] = _conv_init(next(keys), 2, d3, d, dtype)
    grid = img_size // PATCH
    p["pos"] = _trunc_normal(next(keys), (grid, grid, d), dtype=dtype)
    p["blocks"] = [_vit_block_init(next(keys), d, dtype=dtype)
                   for _ in range(depth)]
    p["enc_ln"] = _ln_init(d, dtype)
    # CUP: conv_more then 4 cascaded upsample stages
    p["more"] = dict(_conv_init(next(keys), 3, d, d3, dtype),
                     ln=_ln_init(d3, dtype))
    # stage widths D/6, D/12, D/12, D/48 after skip concat (published CUP
    # runs 256 -> 128 -> 64 -> 16 at D=768; the 1/2-resolution stage stays
    # at D/12=64 there too since its skip is the 64-wide pyramid root)
    p["dec0"] = dict(_conv_init(next(keys), 3, d3 + d3, d6, dtype),
                     ln=_ln_init(d6, dtype))
    p["dec1"] = dict(_conv_init(next(keys), 3, d6 + d6, d12, dtype),
                     ln=_ln_init(d12, dtype))
    p["dec2"] = dict(_conv_init(next(keys), 3, d12 + d12, d12, dtype),
                     ln=_ln_init(d12, dtype))
    p["dec3"] = dict(_conv_init(next(keys), 3, d12, d48, dtype),
                     ln=_ln_init(d48, dtype))
    p["out"] = _linear_init(next(keys), d48, out_dim, dtype=dtype)
    return p


def transunet_apply(params, x, *, policy: Policy = DEFAULT):
    """x [N, H, W, Cin] -> (loc [N, H, W, 64], glob [N, H, W, 64])."""
    n, h, w, _ = x.shape
    if h % PATCH or w % PATCH:
        raise ValueError(f"input {h}x{w} must be divisible by {PATCH}")
    loc = _conv(x, {"w": params["stem"]["w"]}, 1, policy)
    loc = jax.nn.gelu(_layer_norm(loc, params["stem"]["ln"]))

    # conv pyramid -> skips at 1/2, 1/4, 1/8
    e = policy.cast_compute(x)
    skips = []
    for i in range(3):
        pp = params[f"pyr{i}"]
        e = jax.nn.gelu(_layer_norm(_conv(e, pp, 2, policy), pp["ln"]))
        skips.append(e)

    # patch embed -> ViT at 1/16
    t = _conv(e, params["embed"], 2, policy, padding="VALID")
    gh, gw = t.shape[1], t.shape[2]
    d = t.shape[-1]
    pos = params["pos"].astype(jnp.float32)
    if pos.shape[:2] != (gh, gw):
        pos = jax.image.resize(pos, (gh, gw, d), method="bilinear")
    t = (t.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)
    t = t.reshape(n, gh * gw, d)
    heads = max(1, d // 64)
    for bp in params["blocks"]:
        t = _vit_block(bp, t, heads=heads, policy=policy)
    t = _layer_norm(t, params["enc_ln"]).reshape(n, gh, gw, d)

    # CUP decoder
    mp = params["more"]
    e = jax.nn.relu(_layer_norm(_conv(t, mp, 1, policy), mp["ln"]))
    for i, skip in enumerate((skips[2], skips[1], skips[0], None)):
        e = _upsample2x(e)
        if skip is not None:
            e = jnp.concatenate([e, skip], axis=-1)
        dp = params[f"dec{i}"]
        e = jax.nn.relu(_layer_norm(_conv(e, dp, 1, policy), dp["ln"]))
    glob = _dense(e, params["out"], policy)
    return loc, glob


def transunet_onet_init(key, in_channels: int = 3, *,
                        weight_share: bool = True, embed_dim: int = 768,
                        depth: int = 12, img_size: int = 224,
                        dtype=jnp.float32):
    """Returns (params, state); state is the empty-pytree convention of
    stateless backbones (models/swin.py::swin_onet_init)."""
    if weight_share:
        p = transunet_init(key, in_channels, embed_dim=embed_dim,
                           depth=depth, img_size=img_size, dtype=dtype)
        return {"top": p}, {"top": {}}
    k1, k2 = jax.random.split(key)
    pt = transunet_init(k1, in_channels, embed_dim=embed_dim, depth=depth,
                        img_size=img_size, dtype=dtype)
    pd = transunet_init(k2, in_channels, embed_dim=embed_dim, depth=depth,
                        img_size=img_size, dtype=dtype)
    return {"top": pt, "down": pd}, {"top": {}, "down": {}}


def transunet_onet_forward(params, state, x, *, train: bool = False,
                           bias: float = 0.0, policy: Policy = DEFAULT,
                           reshard=None, ops=None, channel_stack=None,
                           pair_pack=None):
    """Onet forward with the TransUNet backbone; signature-compatible with
    models.onet.onet_forward (models/arch.py swaps it in)."""
    del train, reshard, ops, channel_stack, pair_pack  # conv-backbone knobs
    return stateless_onet_forward(transunet_apply, params, state, x,
                                  bias=bias, policy=policy)
