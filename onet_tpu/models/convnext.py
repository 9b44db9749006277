"""ConvNeXt-UNet twin Onet — the reference's modern-conv backbone ablation.

The snapshot's ablation drivers import an Onet ConvNeXt variant alongside
Swin/TransUNet (`Train_Onet_on_simclutter_20250407.py:31-37`,
`Train_Onet_on_zy3_20240606.py:22-28`) but the model modules are
git-absent (SURVEY.md section 2.9). Like the Swin family (models/swin.py),
this one is rebuilt from the published method — ConvNeXt (Liu et al. 2022,
"A ConvNet for the 2020s") — fitted to the Onet container exactly the way
the reference fits its U-Net (Onet_vanilla_20240606.py:156-191):

* backbone: 4x4 patch-embed conv (stride 4) -> 4 ConvNeXt stages
  (depthwise 7x7 -> LN -> pointwise 4x MLP with GELU -> layer scale ->
  residual) with 2x2 stride-2 downsample convs between them (ConvNeXt-T
  geometry: dims 96-192-384-768, depths 3-3-9-3) -> mirrored light decoder
  (pixel-shuffle patch expand + linear skip fusion + 2 blocks per stage)
  -> final 4x expand to full resolution;
* Onet fit: ``glob`` = full-resolution decoder features projected to 64
  channels; ``loc`` = a full-resolution conv stem (3x3 -> LN -> GELU -> 64).
  Head / losses / drivers are the unchanged Onet machinery
  (models/onet.py::stateless_onet_forward).

TPU design notes:
* the depthwise 7x7 runs as feature_group_count=C conv — VPU-bound on TPU
  (no MXU work), which is exactly the published trade: FLOPs move into the
  pointwise 4x MLPs, which are clean [P, C] x [C, 4C] MXU matmuls;
* LayerNorm is stateless, so the weight-shared twin pass batch-stacks
  [X; 1-X] into one [2B] pass with structural equivalence to sequential
  branch passes (stateless_onet_forward);
* layer-scale gammas init at 1e-6 per the paper; drop-path is omitted for
  the same reason as the Swin family (11-epoch unsupervised runs,
  unpublished regularization would be noise).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models.onet import stateless_onet_forward
from onet_tpu.models.swin import (
    _dense, _expand, _final_expand, _layer_norm, _linear_init, _ln_init,
    _trunc_normal)

PATCH = 4


def _dwconv(x, w, policy: Policy):
    """Depthwise 7x7 SAME conv, one filter per channel. w [7,7,1,C].

    Operand/result dtypes stay equal (the conv VJP transpose is ill-typed
    with a float32 cotangent against bf16 operands — the layers.py::conv3x3
    convention); LayerNorm upcasts for statistics.
    """
    return jax.lax.conv_general_dilated(
        policy.cast_compute(x), policy.cast_compute(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=policy.precision)


def _block_init(key, dim, mlp_ratio=4, dtype=jnp.float32):
    kd, k1, k2 = jax.random.split(key, 3)
    return {
        "dw": _trunc_normal(kd, (7, 7, 1, dim), dtype=dtype),
        "dwb": jnp.zeros((dim,), dtype),
        "ln": _ln_init(dim, dtype),
        "fc1": _linear_init(k1, dim, mlp_ratio * dim, dtype=dtype),
        "fc2": _linear_init(k2, mlp_ratio * dim, dim, dtype=dtype),
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def _block(p, x, policy: Policy):
    h = _dwconv(x, p["dw"], policy) + p["dwb"].astype(policy.compute_dtype)
    h = _layer_norm(h, p["ln"])
    h = _dense(h, p["fc1"], policy)
    h = _dense(jax.nn.gelu(h), p["fc2"], policy)
    return x + h * p["gamma"].astype(h.dtype)


def convnext_unet_init(key, in_channels: int, *, embed_dim: int = 96,
                       depths=(3, 3, 9, 3), dec_depth: int = 2,
                       out_dim: int = 64, dtype=jnp.float32):
    """Params pytree for one ConvNeXt-UNet (ConvNeXt-T geometry by default;
    ``embed_dim`` scales the whole width for tests)."""
    dims = [embed_dim * (2 ** i) for i in range(4)]
    keys = iter(jax.random.split(key, 64))
    p = {}
    fan_in = 9 * in_channels
    p["stem"] = {"w": (jax.random.normal(next(keys),
                                         (3, 3, in_channels, out_dim))
                       * np.sqrt(2.0 / fan_in)).astype(dtype),
                 "ln": _ln_init(out_dim, dtype)}
    p["embed"] = {"w": _trunc_normal(next(keys),
                                     (PATCH, PATCH, in_channels, dims[0]),
                                     dtype=dtype),
                  "b": jnp.zeros((dims[0],), dtype),
                  "ln": _ln_init(dims[0], dtype)}
    for i in range(4):                                    # encoder stages
        p[f"enc{i}"] = [_block_init(next(keys), dims[i], dtype=dtype)
                        for _ in range(depths[i])]
        if i < 3:                                         # downsample convs
            p[f"down{i}"] = {
                "ln": _ln_init(dims[i], dtype),
                "w": _trunc_normal(next(keys), (2, 2, dims[i], dims[i + 1]),
                                   dtype=dtype),
                "b": jnp.zeros((dims[i + 1],), dtype)}
    for i in (2, 1, 0):                                   # decoder stages
        p[f"up{i}"] = {"w_only": _trunc_normal(next(keys),
                                               (2 * dims[i], 4 * dims[i]),
                                               dtype=dtype),
                       "ln": _ln_init(dims[i], dtype)}
        p[f"fuse{i}"] = _linear_init(next(keys), 2 * dims[i], dims[i],
                                     bias=False, dtype=dtype)
        p[f"dec{i}"] = [_block_init(next(keys), dims[i], dtype=dtype)
                        for _ in range(dec_depth)]
    p["final"] = {"w_only": _trunc_normal(next(keys),
                                          (dims[0], 16 * dims[0]),
                                          dtype=dtype),
                  "ln": _ln_init(dims[0], dtype)}
    p["out"] = _linear_init(next(keys), dims[0], out_dim, dtype=dtype)
    return p


def convnext_unet_apply(params, x, *, policy: Policy = DEFAULT):
    """x [N, H, W, Cin] -> (loc [N, H, W, out], glob [N, H, W, out])."""
    n, h, w, _ = x.shape
    if h % (PATCH * 8) or w % (PATCH * 8):
        raise ValueError(f"input {h}x{w} must be divisible by {PATCH * 8}")
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
    for i in range(4):
        for bp in params[f"enc{i}"]:
            e = _block(bp, e, policy)
        if i < 3:
            skips.append(e)
            d = params[f"down{i}"]
            e = jax.lax.conv_general_dilated(
                _layer_norm(e, d["ln"]), policy.cast_compute(d["w"]),
                (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=policy.precision)
            e = e + policy.cast_compute(d["b"])
    for i in (2, 1, 0):
        e = _expand(params[f"up{i}"], e, policy)
        e = _dense(jnp.concatenate([skips[i], e], axis=-1),
                   params[f"fuse{i}"], policy)
        for bp in params[f"dec{i}"]:
            e = _block(bp, e, policy)
    e = _final_expand(params["final"], e, policy)
    glob = _dense(e, params["out"], policy)
    return loc, glob


def convnext_onet_init(key, in_channels: int = 3, *,
                       weight_share: bool = True, embed_dim: int = 96,
                       depths=(3, 3, 9, 3), dtype=jnp.float32):
    """Returns (params, state); state is the empty-pytree convention of
    stateless backbones (models/swin.py::swin_onet_init)."""
    if weight_share:
        p = convnext_unet_init(key, in_channels, embed_dim=embed_dim,
                               depths=depths, dtype=dtype)
        return {"top": p}, {"top": {}}
    k1, k2 = jax.random.split(key)
    pt = convnext_unet_init(k1, in_channels, embed_dim=embed_dim,
                            depths=depths, dtype=dtype)
    pd = convnext_unet_init(k2, in_channels, embed_dim=embed_dim,
                            depths=depths, dtype=dtype)
    return {"top": pt, "down": pd}, {"top": {}, "down": {}}


def convnext_onet_forward(params, state, x, *, train: bool = False,
                          bias: float = 0.0, policy: Policy = DEFAULT,
                          reshard=None, ops=None, channel_stack=None,
                          pair_pack=None):
    """Onet forward with the ConvNeXt-UNet backbone; signature-compatible
    with models.onet.onet_forward (models/arch.py swaps it in)."""
    del train, reshard, ops, channel_stack, pair_pack  # conv-backbone knobs
    return stateless_onet_forward(convnext_unet_apply, params, state, x,
                                  bias=bias, policy=policy)
