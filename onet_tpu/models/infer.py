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
from onet_tpu.models.layers import (
    BN_EPS, max_pool_2x2, conv_transpose_2x2, relu, bd2, bd2_skip_up,
    interleave_branches, restack_branches)
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


def _cbr_stacked(x, pc, policy, *, wmap=bd2):
    """conv + tiled bias + relu on a channel-stacked pair."""
    y = lax.conv_general_dilated(
        policy.cast_compute(x), policy.cast_compute(wmap(pc["w"])),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
    return relu(y + jnp.tile(pc["b"], 2).astype(y.dtype))


def unet_infer_stacked(fp, x, *, policy: Policy = BF16_COMPUTE,
                       dp_local: bool = False):
    """Folded forward with the branches channel-stacked at the 64-channel
    levels (see unet.unet_apply_stacked for the rationale; numerics exact).
    ``x`` is [B, H, W, 2*cin]; returns stacked (local, glob) [B,H,W,128].

    ``dp_local=True`` interleaves the two batch restack sites (shard-local
    under plain-jit dp; the shard_map serving path never needs it). No BN
    here, so layout touches nothing else."""
    b = x.shape[0]
    h = _cbr_stacked(x, fp["inc"]["conv1"], policy)
    x1s = _cbr_stacked(h, fp["inc"]["conv2"], policy)
    hp = max_pool_2x2(x1s)
    c = x1s.shape[-1] // 2
    # down1.conv1 stacked as in unet_apply_stacked; unstack on its output
    h = _cbr_stacked(hp, fp["down1"]["conv1"], policy)
    if dp_local:
        xb = interleave_branches(h)                            # -> [2B,...]
    else:
        c1 = h.shape[-1] // 2
        xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
    feats = [None]
    hcur = _conv_bias_relu(xb, fp["down1"]["conv2"], policy)
    feats.append(hcur)
    for i in range(2, 5):
        hcur = _dconv_infer(fp[f"down{i}"], max_pool_2x2(hcur), policy)
        feats.append(hcur)
    y = feats[-1]
    for i in range(1, 4):
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
    if dp_local:
        y2s = restack_branches(y)                              # restack
    else:
        y2s = jnp.concatenate([y[:b], y[b:]], axis=-1)
    up = fp["up4"]["up"]
    u = conv_transpose_2x2(y2s, bd2(up["w"]), jnp.tile(up["b"], 2),
                           policy=policy)
    dh = x1s.shape[1] - u.shape[1]
    dw = x1s.shape[2] - u.shape[2]
    if dh or dw:
        u = jnp.pad(u, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
    xin = jnp.concatenate([x1s, u], axis=-1)                   # [s1|s2|u1|u2]
    pc = fp["up4"]["conv"]
    h = _cbr_stacked(xin, pc["conv1"], policy,
                     wmap=lambda w: bd2_skip_up(w, c_skip=c))
    y1s = _cbr_stacked(h, pc["conv2"], policy)
    return x1s, y1s


def onet_infer(folded, x, *, bias: float = 0.0,
               policy: Policy = BF16_COMPUTE, channel_stack: bool = None,
               pair_pack: bool = None, dp_local: bool = False):
    """Folded-forward -> (S [B,H,W,2], labels [B,H,W]).

    ``dp_local=True``: shard-local twin restack for plain-jit dp over a
    mesh (see unet_infer_stacked); the shard_map serving path (serve
    --dp) keeps the default."""
    from onet_tpu.models.onet import CHANNEL_STACK, PAIR_PACK, stacked_head

    xd = complement(x, bias)
    stack = CHANNEL_STACK if channel_stack is None else channel_stack
    wp = PAIR_PACK if pair_pack is None else pair_pack
    if "down" not in folded and wp:
        from onet_tpu.models.wp import unet_infer_wp, head_wp, wp_supported
        base = folded["top"]["inc"]["conv1"]["w"].shape[-1]
        if wp_supported(x.shape, base):
            xx = jnp.concatenate([x, xd], axis=-1)
            loc_wp, glob_wp = unet_infer_wp(folded["top"], xx, policy=policy)
            v, _ = head_wp(loc_wp, glob_wp)
            s = jax.nn.softmax(v, axis=-1)
            return s, jnp.argmax(s, axis=-1)
    if "down" not in folded and stack:
        xx = jnp.concatenate([x, xd], axis=-1)
        loc, glob = unet_infer_stacked(folded["top"], xx, policy=policy,
                                       dp_local=dp_local)
        v, _ = stacked_head(loc, glob)
        s = jax.nn.softmax(v, axis=-1)
        return s, jnp.argmax(s, axis=-1)
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
