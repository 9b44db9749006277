"""BN-folded inference path.

In eval mode BatchNorm is a per-channel affine with frozen statistics, so
it folds into the preceding conv: w' = w * s, b' = beta - mean * s with
s = gamma / sqrt(var + eps). The folded graph is conv+bias -> ReLU chains —
half the HBM round-trips of conv -> BN -> ReLU at inference time, with
bit-identical-up-to-fp-reassociation outputs. This is the serving path the
bench's "infer" half uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.policy import Policy, BF16_COMPUTE
from onet_tpu.models.layers import BN_EPS, max_pool_2x2, conv_transpose_2x2, relu
from onet_tpu.models.onet import channel_dot, is_weight_shared
from onet_tpu.ops.normalize import complement


def _fold_dconv(p, s):
    def fold(conv_w, bn_p, bn_s):
        scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
        w = conv_w * scale[None, None, None, :]
        b = bn_p["bias"] - bn_s["mean"] * scale
        return {"w": w, "b": b}

    return {
        "conv1": fold(p["conv1"]["w"], p["bn1"], s["bn1"]),
        "conv2": fold(p["conv2"]["w"], p["bn2"], s["bn2"]),
    }


def fold_unet(params, state):
    out = {}
    out["inc"] = _fold_dconv(params["inc"], state["inc"])
    for i in range(1, 5):
        out[f"down{i}"] = _fold_dconv(params[f"down{i}"], state[f"down{i}"])
    for i in range(1, 5):
        out[f"up{i}"] = {
            "up": params[f"up{i}"]["up"],
            "conv": _fold_dconv(params[f"up{i}"]["conv"],
                                state[f"up{i}"]["conv"]),
        }
    return out


def fold_onet(params, state):
    folded = {"top": fold_unet(params["top"], state["top"])}
    if not is_weight_shared(params):
        folded["down"] = fold_unet(params["down"], state["down"])
    return folded


def _conv_bias_relu(x, pc, policy):
    y = lax.conv_general_dilated(
        policy.cast_compute(x), policy.cast_compute(pc["w"]),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
    return relu(y + pc["b"].astype(y.dtype))


def _dconv_infer(p, x, policy):
    return _conv_bias_relu(_conv_bias_relu(x, p["conv1"], policy),
                           p["conv2"], policy)


def unet_infer(fp, x, *, policy: Policy = BF16_COMPUTE):
    x1 = _dconv_infer(fp["inc"], x, policy)
    feats = [x1]
    h = x1
    for i in range(1, 5):
        h = _dconv_infer(fp[f"down{i}"], max_pool_2x2(h), policy)
        feats.append(h)
    y = feats[-1]
    for i in range(1, 5):
        up = fp[f"up{i}"]["up"]
        y = conv_transpose_2x2(y, up["w"], up["b"], policy=policy)
        skip = feats[4 - i]
        dh = skip.shape[1] - y.shape[1]
        dw = skip.shape[2] - y.shape[2]
        if dh or dw:
            y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2),
                            (dw // 2, dw - dw // 2), (0, 0)))
        y = _dconv_infer(fp[f"up{i}"]["conv"],
                         jnp.concatenate([skip, y], axis=-1), policy)
    return x1, y


def onet_infer(folded, x, *, bias: float = 0.0,
               policy: Policy = BF16_COMPUTE):
    """Folded-forward -> (S [B,H,W,2], labels [B,H,W])."""
    xd = complement(x, bias)
    if "down" not in folded:
        xx = jnp.concatenate([x, xd], axis=0)
        loc, glob = unet_infer(folded["top"], xx, policy=policy)
        b = x.shape[0]
        lt, ld = loc[:b], loc[b:]
        ht, hd = glob[:b], glob[b:]
    else:
        lt, ht = unet_infer(folded["top"], x, policy=policy)
        ld, hd = unet_infer(folded["down"], xd, policy=policy)
    vt = channel_dot(lt.astype(jnp.float32), ht.astype(jnp.float32))
    vd = channel_dot(ld.astype(jnp.float32), hd.astype(jnp.float32))
    s = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    return s, jnp.argmax(s, axis=-1)
