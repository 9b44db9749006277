"""Swin-Unet twin Onet — the reference's transformer-backbone ablation.

The snapshot's ``train_outc_model`` instantiates
``Onet_Swin_Unet(swin_config, in_chns=3, n_classes=2, bshare=True)``
(Train_Onet_on_zy3_20240606.py:370-377) but the model module and its config
are git-absent (SURVEY.md section 2.9) — like InfoSeg and IIC, this family
is rebuilt from the published methods: Swin Transformer (Liu et al. 2021)
and Swin-Unet (Cao et al. 2021), fitted to the Onet container the same way
the reference fits its U-Net (Onet_vanilla_20240606.py:156-191):

* backbone: 4x4 patch embed -> 3 Swin stages (window + shifted-window MSA,
  patch merging) -> bottleneck -> mirrored decoder with patch-expanding
  (pixel shuffle) and linear skip fusion -> final 4x expand to full
  resolution; Swin-T geometry (embed 96, depths 2-2-2-2, heads 3-6-12-24,
  window 7, MLP ratio 4).
* Onet fit: ``glob`` = final full-resolution decoder features projected to
  64 channels; ``loc`` = a full-resolution conv stem (3x3 -> LN -> GELU ->
  64) standing in for the vanilla first-DoubleConv local features. The
  projection head, softmax pair, JSD loss and every driver/eval path are
  the unchanged Onet machinery (models/onet.py).

TPU design notes:
* LayerNorm has no cross-sample statistics, so the weight-shared twin pass
  batch-stacks [X; 1-X] into one [2B] pass with STRUCTURAL equivalence to
  two sequential passes (BatchNorm needed grouped statistics for that;
  tests assert the equivalence here too).
* window attention is [B*nW, 49, C] batched matmuls — tiny MXU tiles
  either way; they are left to XLA (nothing for a flash kernel to fuse at
  49 tokens, no O(T^2) memory issue). The big matmuls (qkv/proj/mlp) run
  in the bf16 policy with f32 accumulation like every conv in the repo.
* shifted windows use jnp.roll (a lane rotation XLA handles natively) and
  a trace-time numpy attention mask; no dynamic shapes anywhere.
* drop-path/dropout are omitted (the reference trains 11-epoch
  unsupervised runs; regularization hyperparameters it never published
  would be noise) — documented design choice.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models.onet import stateless_onet_forward


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return (jax.random.truncated_normal(key, -2.0, 2.0, shape) * std).astype(dtype)


def _linear_init(key, din, dout, *, bias=True, dtype=jnp.float32):
    p = {"w": _trunc_normal(key, (din, dout), dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _ln_init(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def _layer_norm(x, p, eps=1e-5):
    # Two-pass variance (mean of squared deviations): non-negative under
    # any rounding/fusion. The one-pass E[x^2]-E[x]^2 form cancelled to
    # var ~ -1e-2 on TPU at tiny channel widths (TransUNet dec3, C=2) and
    # fed rsqrt a negative argument -> NaN (runs/ln_nan_probe.py).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _dense(x, p, policy: Policy):
    w = policy.cast_compute(p["w"])
    y = jax.lax.dot_general(policy.cast_compute(x), w,
                            (((x.ndim - 1,), (0,)), ((), ())),
                            precision=policy.precision,
                            preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(policy.compute_dtype)


# ---------------------------------------------------------------------------
# window attention
# ---------------------------------------------------------------------------

def _rel_pos_index(window: int) -> np.ndarray:
    """[T, T] indices into the (2w-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # [2, w, w]
    flat = coords.reshape(2, -1)                            # [2, T]
    rel = flat[:, :, None] - flat[:, None, :]               # [2, T, T]
    rel = rel.transpose(1, 2, 0) + (window - 1)             # to >= 0
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """[nW, T, T] additive mask for shifted-window attention (0 within a
    contiguous region, -100 across the cyclic-shift seams)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - window), slice(h - window, h - shift),
               slice(h - shift, h)):
        for ws in (slice(0, w - window), slice(w - window, w - shift),
                   slice(w - shift, w)):
            img[hs, ws] = cnt
            cnt += 1
    ids = img.reshape(h // window, window, w // window, window)
    ids = ids.transpose(0, 2, 1, 3).reshape(-1, window * window)  # [nW, T]
    return np.where(ids[:, :, None] != ids[:, None, :],
                    -100.0, 0.0).astype(np.float32)


def _attn_init(key, dim, heads, window, dtype=jnp.float32):
    kq, kp, kr = jax.random.split(key, 3)
    return {
        "qkv": _linear_init(kq, dim, 3 * dim, dtype=dtype),
        "proj": _linear_init(kp, dim, dim, dtype=dtype),
        "rpb": _trunc_normal(kr, ((2 * window - 1) ** 2, heads), dtype=dtype),
    }


def _window_attention(p, x, *, heads, window, shift, policy: Policy):
    n, h, w, d = x.shape
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    nh, nw = h // window, w // window
    t = window * window
    xw = x.reshape(n, nh, window, nw, window, d)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(n * nh * nw, t, d)

    dh = d // heads
    qkv = _dense(xw, p["qkv"], policy)                       # [B_, T, 3D]
    qkv = qkv.reshape(-1, t, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                         # [B_, nh, T, dh]
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k,
                      precision=policy.precision,
                      preferred_element_type=jnp.float32)
    attn = attn.astype(jnp.float32) * (dh ** -0.5)
    bias = p["rpb"].astype(jnp.float32)[jnp.asarray(_rel_pos_index(window))]
    attn = attn + bias.transpose(2, 0, 1)[None]              # [B_, nh, T, T]
    if shift:
        mask = jnp.asarray(_shift_mask(h, w, window, shift))  # [nW, T, T]
        attn = attn.reshape(n, nh * nw, heads, t, t) + mask[None, :, None]
        attn = attn.reshape(n * nh * nw, heads, t, t)
    attn = jax.nn.softmax(attn, axis=-1).astype(policy.compute_dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, policy.cast_compute(v),
                     precision=policy.precision,
                     preferred_element_type=jnp.float32)
    out = out.astype(policy.compute_dtype)
    out = out.transpose(0, 2, 1, 3).reshape(n * nh * nw, t, d)
    out = _dense(out, p["proj"], policy)
    out = out.reshape(n, nh, nw, window, window, d)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, d)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


# ---------------------------------------------------------------------------
# blocks / stages
# ---------------------------------------------------------------------------

def _block_init(key, dim, heads, window, mlp_ratio, dtype=jnp.float32):
    ka, k1, k2 = jax.random.split(key, 3)
    hidden = dim * mlp_ratio
    return {
        "ln1": _ln_init(dim, dtype),
        "attn": _attn_init(ka, dim, heads, window, dtype),
        "ln2": _ln_init(dim, dtype),
        "fc1": _linear_init(k1, dim, hidden, dtype=dtype),
        "fc2": _linear_init(k2, hidden, dim, dtype=dtype),
    }


def _block(p, x, *, heads, window, shift, policy: Policy):
    h = _window_attention(p["attn"], _layer_norm(x, p["ln1"]),
                          heads=heads, window=window, shift=shift,
                          policy=policy)
    x = x + h
    m = _dense(_layer_norm(x, p["ln2"]), p["fc1"], policy)
    m = _dense(jax.nn.gelu(m), p["fc2"], policy)
    return x + m


def _stage(blocks, x, *, heads, window, policy: Policy):
    """Alternating W-MSA / SW-MSA blocks; shift disabled when the feature
    map is not larger than one window (the published rule)."""
    shift = window // 2 if x.shape[1] > window else 0
    for i, bp in enumerate(blocks):
        x = _block(bp, x, heads=heads, window=window,
                   shift=shift if i % 2 else 0, policy=policy)
    return x


def _merge(p, x, policy: Policy):
    """Patch merging: 2x2 neighborhood concat -> LN -> linear 4D -> 2D."""
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    return _dense(_layer_norm(x, p["ln"]), {"w": p["w_only"]}, policy)


def _expand(p, x, policy: Policy):
    """Patch expanding: linear D -> 2D -> 2x2 pixel shuffle -> LN(D/2)."""
    x = _dense(x, {"w": p["w_only"]}, policy)
    n, h, w, d2 = x.shape
    c = d2 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, 2 * h, 2 * w, c)
    return _layer_norm(x, p["ln"])


def _final_expand(p, x, policy: Policy):
    """4x expand keeping D: linear D -> 16D -> 4x4 pixel shuffle -> LN."""
    x = _dense(x, {"w": p["w_only"]}, policy)
    n, h, w, d16 = x.shape
    c = d16 // 16
    x = x.reshape(n, h, w, 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, 4 * h, 4 * w, c)
    return _layer_norm(x, p["ln"])


# ---------------------------------------------------------------------------
# Swin-Unet backbone
# ---------------------------------------------------------------------------

PATCH = 4


def swin_unet_init(key, in_channels: int, *, embed_dim: int = 96,
                   depths=(2, 2, 2, 2), heads=(3, 6, 12, 24), window: int = 7,
                   mlp_ratio: int = 4, out_dim: int = 64, dtype=jnp.float32):
    """Params pytree for one Swin-Unet. Geometry (heads/window) is derived
    from parameter shapes at apply time, so there is no static state."""
    dims = [embed_dim * (2 ** i) for i in range(4)]
    keys = iter(jax.random.split(key, 64))
    p = {}
    # full-resolution conv stem (the Onet 'loc' path)
    fan_in = 9 * in_channels
    p["stem"] = {"w": (jax.random.normal(next(keys), (3, 3, in_channels, out_dim))
                       * np.sqrt(2.0 / fan_in)).astype(dtype),
                 "ln": _ln_init(out_dim, dtype)}
    p["embed"] = {"w": _trunc_normal(next(keys),
                                     (PATCH, PATCH, in_channels, dims[0]),
                                     dtype=dtype),
                  "b": jnp.zeros((dims[0],), dtype),
                  "ln": _ln_init(dims[0], dtype)}
    for i in range(3):                                    # encoder stages
        p[f"enc{i}"] = [_block_init(next(keys), dims[i], heads[i], window,
                                    mlp_ratio, dtype) for _ in range(depths[i])]
        p[f"merge{i}"] = {"ln": _ln_init(4 * dims[i], dtype),
                          "w_only": _trunc_normal(next(keys),
                                                  (4 * dims[i], 2 * dims[i]),
                                                  dtype=dtype)}
    p["bott"] = [_block_init(next(keys), dims[3], heads[3], window,
                             mlp_ratio, dtype) for _ in range(depths[3])]
    for i in (2, 1, 0):                                   # decoder stages
        p[f"up{i}"] = {"w_only": _trunc_normal(next(keys),
                                               (2 * dims[i], 4 * dims[i]),
                                               dtype=dtype),
                       "ln": _ln_init(dims[i], dtype)}
        p[f"fuse{i}"] = _linear_init(next(keys), 2 * dims[i], dims[i],
                                     bias=False, dtype=dtype)
        p[f"dec{i}"] = [_block_init(next(keys), dims[i], heads[i], window,
                                    mlp_ratio, dtype) for _ in range(depths[i])]
    p["final"] = {"w_only": _trunc_normal(next(keys),
                                          (dims[0], 16 * dims[0]), dtype=dtype),
                  "ln": _ln_init(dims[0], dtype)}
    p["out"] = _linear_init(next(keys), dims[0], out_dim, dtype=dtype)
    return p


def _geometry(params):
    """(heads per stage, window) read off the rpb tables — static shapes."""
    rpb0 = params["enc0"][0]["attn"]["rpb"]
    window = (int(round(np.sqrt(rpb0.shape[0]))) + 1) // 2
    heads = tuple(params[k][0]["attn"]["rpb"].shape[1]
                  for k in ("enc0", "enc1", "enc2", "bott"))
    return heads, window


def swin_unet_apply(params, x, *, policy: Policy = DEFAULT):
    """x [N, H, W, Cin] -> (loc [N, H, W, out], glob [N, H, W, out])."""
    heads, window = _geometry(params)
    n, h, w, _ = x.shape
    if h % (PATCH * 8) or w % (PATCH * 8):
        raise ValueError(f"input {h}x{w} must be divisible by {PATCH * 8}")
    for s in range(4):
        side = h // PATCH // (2 ** s)
        if side < window or side % window:
            raise ValueError(f"stage {s} feature side {side} not divisible "
                             f"by window {window}; pick --swin-window "
                             "accordingly (7 fits 224^2, 8 fits 512^2)")
    # Convs keep operand/result dtypes equal (the conv VJP transpose is
    # ill-typed with a float32 cotangent against bf16 operands — same
    # convention as layers.py::conv3x3); the MXU accumulates in fp32 either
    # way and LayerNorm upcasts for its statistics.
    xc = policy.cast_compute(x)
    loc = jax.lax.conv_general_dilated(
        xc, policy.cast_compute(params["stem"]["w"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
    loc = jax.nn.gelu(_layer_norm(loc, params["stem"]["ln"]))

    e = jax.lax.conv_general_dilated(
        xc, policy.cast_compute(params["embed"]["w"]), (PATCH, PATCH),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
    e = e + policy.cast_compute(params["embed"]["b"])
    e = _layer_norm(e, params["embed"]["ln"])

    skips = []
    for i in range(3):
        e = _stage(params[f"enc{i}"], e, heads=heads[i], window=window,
                   policy=policy)
        skips.append(e)
        e = _merge(params[f"merge{i}"], e, policy)
    e = _stage(params["bott"], e, heads=heads[3], window=window,
               policy=policy)
    for i in (2, 1, 0):
        e = _expand(params[f"up{i}"], e, policy)
        e = _dense(jnp.concatenate([skips[i], e], axis=-1),
                   params[f"fuse{i}"], policy)
        e = _stage(params[f"dec{i}"], e, heads=heads[i], window=window,
                   policy=policy)
    e = _final_expand(params["final"], e, policy)
    glob = _dense(e, params["out"], policy)
    return loc, glob


# ---------------------------------------------------------------------------
# Onet container
# ---------------------------------------------------------------------------

def swin_onet_init(key, in_channels: int = 3, *, weight_share: bool = True,
                   window: int = 7, embed_dim: int = 96, dtype=jnp.float32):
    """Returns (params, state). ``state`` is an EMPTY pytree per branch
    (LayerNorm is stateless — no running statistics), shaped like the
    vanilla state so drivers/checkpoints treat it uniformly."""
    if weight_share:
        p = swin_unet_init(key, in_channels, window=window,
                           embed_dim=embed_dim, dtype=dtype)
        return {"top": p}, {"top": {}}
    k1, k2 = jax.random.split(key)
    pt = swin_unet_init(k1, in_channels, window=window,
                        embed_dim=embed_dim, dtype=dtype)
    pd = swin_unet_init(k2, in_channels, window=window,
                        embed_dim=embed_dim, dtype=dtype)
    return {"top": pt, "down": pd}, {"top": {}, "down": {}}


def swin_onet_forward(params, state, x, *, train: bool = False,
                      bias: float = 0.0, policy: Policy = DEFAULT,
                      reshard=None, ops=None, channel_stack=None,
                      pair_pack=None):
    """Onet forward with the Swin-Unet backbone. Signature-compatible with
    models.onet.onet_forward so train/eval steps swap it in (models/arch.py);
    the conv-specific knobs (ops/reshard/stacking) are accepted and must be
    None/default — this backbone has no grouped-BN or halo machinery."""
    del train, reshard, ops, channel_stack, pair_pack  # conv-backbone knobs
    return stateless_onet_forward(swin_unet_apply, params, state, x,
                                  bias=bias, policy=policy)
