"""Functional 4-down/4-up U-Net returning (local, global) feature maps.

Structure parity with the reference UNet (Onet_vanilla_20240606.py:104-153):
channels 64-128-256-512-1024, DoubleConv = (3x3 conv no-bias -> BN -> ReLU)x2
(:39-58), Down = maxpool2 + DoubleConv (:61-72), Up = ConvTranspose(k=2,s=2)
-> pad-to-match -> concat(skip, up) -> DoubleConv (:75-101). The forward
returns the FIRST DoubleConv output (64-ch local features) and the LAST
decoder output (64-ch global features); there is no segmentation head
(:142-153).

TPU design: one fused [G*B, H, W, C] pass carries G complementary branches
(see layers.batch_norm); all shapes static; odd spatial sizes get the same
asymmetric pad as the reference's F.pad (:92-96).
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L

CHANNELS = (64, 128, 256, 512, 1024)

# Injectable layer primitives: the default executes locally; the spatial
# trainer (parallel/halo.py) substitutes halo-exchange convs and
# cross-shard-reduced BatchNorm to run EXACTLY under an H-sharded mesh.
DEFAULT_OPS = types.SimpleNamespace(
    conv3x3=L.conv3x3,
    batch_norm=L.batch_norm,
    max_pool=L.max_pool_2x2,
    conv_transpose=L.conv_transpose_2x2,
)


def _channels(base: int = 64):
    return tuple(base * m for m in (1, 2, 4, 8, 16))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _double_conv_init(key, cin, cout, cmid=None, dtype=jnp.float32):
    cmid = cmid or cout
    k1, k2 = jax.random.split(key)
    p1, s1 = L.bn_init(cmid, dtype)
    p2, s2 = L.bn_init(cout, dtype)
    params = {
        "conv1": {"w": L.kaiming_normal_conv(k1, 3, 3, cin, cmid, dtype)},
        "bn1": p1,
        "conv2": {"w": L.kaiming_normal_conv(k2, 3, 3, cmid, cout, dtype)},
        "bn2": p2,
    }
    state = {"bn1": s1, "bn2": s2}
    return params, state


def _up_init(key, cin, cout, dtype=jnp.float32):
    kt, kc = jax.random.split(key)
    w, b = L.torch_default_convT(kt, 2, 2, cin, cin // 2, dtype)
    conv_p, conv_s = _double_conv_init(kc, cin, cout, dtype=dtype)
    return {"up": {"w": w, "b": b}, "conv": conv_p}, {"conv": conv_s}


def unet_init(key, in_channels: int = 1, dtype=jnp.float32, *, base: int = 64):
    """Build the (params, state) pytrees for one U-Net.

    ``base`` scales every stage width (64 -> the reference's 31M-param net;
    smaller values give structurally identical shrunken nets for tests).
    """
    c = _channels(base)
    keys = jax.random.split(key, 9)
    params, state = {}, {}
    params["inc"], state["inc"] = _double_conv_init(keys[0], in_channels, c[0], dtype=dtype)
    downs_in = c[:4]
    for i in range(4):
        p, s = _double_conv_init(keys[1 + i], downs_in[i], c[i + 1], dtype=dtype)
        params[f"down{i + 1}"], state[f"down{i + 1}"] = p, s
    ups_in = (c[4], c[3], c[2], c[1])
    ups_out = (c[3], c[2], c[1], c[0])
    for i in range(4):
        p, s = _up_init(keys[5 + i], ups_in[i], ups_out[i], dtype=dtype)
        params[f"up{i + 1}"], state[f"up{i + 1}"] = p, s
    return params, state


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _double_conv(params, state, x, *, train, groups, policy, ops=DEFAULT_OPS,
                 interleaved=False):
    x = ops.conv3x3(x, params["conv1"]["w"], policy=policy)
    x, s1 = ops.batch_norm(x, params["bn1"], state["bn1"], train=train,
                           groups=groups, interleaved=interleaved)
    x = L.relu(x)
    x = ops.conv3x3(x, params["conv2"]["w"], policy=policy)
    x, s2 = ops.batch_norm(x, params["bn2"], state["bn2"], train=train,
                           groups=groups, interleaved=interleaved)
    x = L.relu(x)
    return x, {"bn1": s1, "bn2": s2}


def _down(params, state, x, *, train, groups, policy, ops=DEFAULT_OPS,
          interleaved=False):
    return _double_conv(params, state, ops.max_pool(x), train=train,
                        groups=groups, policy=policy, ops=ops,
                        interleaved=interleaved)


def _up(params, state, x, skip, *, train, groups, policy, ops=DEFAULT_OPS,
        interleaved=False):
    x = ops.conv_transpose(x, params["up"]["w"], params["up"]["b"], policy=policy)
    dh = skip.shape[1] - x.shape[1]
    dw = skip.shape[2] - x.shape[2]
    if dh or dw:
        x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    x = jnp.concatenate([skip, x], axis=-1)  # reference concat order: [skip, up]
    y, s = _double_conv(params["conv"], state["conv"], x, train=train,
                        groups=groups, policy=policy, ops=ops,
                        interleaved=interleaved)
    return y, {"conv": s}


def unet_apply_stacked(params, state, x, *, train: bool,
                       policy: Policy = DEFAULT, reshard=None,
                       ops=DEFAULT_OPS, dp_local: bool = False):
    """Weight-shared twin pass with the branches CHANNEL-stacked at the
    64-channel 512^2-scale levels (inc, up4) and batch-stacked in between.

    Rationale (measured, see RESULTS.md): XLA pads 64-lane NHWC tensors to
    128 lanes in HBM and on the MXU, so every pass over a [2B, H, W, 64]
    tensor moves 2x the bytes and fills half the systolic array. Stacking
    the complementary branches on channels makes the shallow levels dense
    [B, H, W, 128] with block-diagonal weights (layers.bd2) — numerically
    exact (zero off-diagonal blocks), 2x nominal conv FLOPs at those two
    levels but strictly faster end-to-end, and half the traffic for BN /
    pool / ReLU / head.

    ``dp_local`` selects the batch layout of the middle (batch-stacked)
    levels. False (default): block concat [branch0 batch | branch1 batch]
    — the fastest single-chip form (XLA fuses the concat/slices; measured
    74.4 vs 71.5 t/s combined). True: sample-major INTERLEAVE (branch b
    of sample i -> batch index 2i+b, layers.interleave_branches) — under
    a sharded batch axis the block concat crosses the data-axis shard
    boundary and plain-jit GSPMD redistributes 3.7 GB/step of activations
    (54.9 ms at dp8, RESULTS.md round 5); the interleave is shard-local
    (2.74 ms, gradient all-reduce only). train/steps.py sets it
    automatically whenever the step is built over a mesh. Both layouts
    are statistic- and gradient-exact (tests/test_channel_stack.py).

    ``x`` is [B, H, W, 2*in_ch] (branch blocks on channels). Returns
    ((local, glob), state) with local/glob [B, H, W, 128] channel-stacked.
    """
    rs = reshard or (lambda tag, t: t)
    new_state = {}
    b = x.shape[0]
    p, s = params["inc"], state["inc"]
    h = ops.conv3x3(x, L.bd2(p["conv1"]["w"]), policy=policy)
    h, s1 = ops.batch_norm(h, p["bn1"], s["bn1"], train=train, groups=2,
                           stacked=True)
    h = L.relu(h)
    h = ops.conv3x3(h, L.bd2(p["conv2"]["w"]), policy=policy)
    h, s2 = ops.batch_norm(h, p["bn2"], s["bn2"], train=train, groups=2,
                           stacked=True)
    x1s = L.relu(h)
    new_state["inc"] = {"bn1": s1, "bn2": s2}

    hp = ops.max_pool(x1s)                         # stacked pool: half traffic
    c = x1s.shape[-1] // 2
    # down1.conv1 also runs channel-stacked (its 64-lane input would be
    # lane-padded in batched form); the unstack to batch form happens on
    # the unpadded 128-per-branch conv1 output (layout per dp_local above)
    p1, s1d = params["down1"], state["down1"]
    h = ops.conv3x3(hp, L.bd2(p1["conv1"]["w"]), policy=policy)
    h, s1 = ops.batch_norm(h, p1["bn1"], s1d["bn1"], train=train, groups=2,
                           stacked=True)
    h = L.relu(h)
    if dp_local:
        xb = L.interleave_branches(h)                          # -> [2B,...]
    else:
        c1 = h.shape[-1] // 2
        xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
    xb = ops.conv3x3(xb, p1["conv2"]["w"], policy=policy)
    xb, s2 = ops.batch_norm(xb, p1["bn2"], s1d["bn2"], train=train, groups=2,
                            interleaved=dp_local)
    x2 = L.relu(xb)
    new_state["down1"] = {"bn1": s1, "bn2": s2}
    x3, new_state["down2"] = _down(params["down2"], state["down2"], x2,
                                   train=train, groups=2, policy=policy,
                                   ops=ops, interleaved=dp_local)
    x3 = rs("deep", x3)
    x4, new_state["down3"] = _down(params["down3"], state["down3"], x3,
                                   train=train, groups=2, policy=policy,
                                   ops=ops, interleaved=dp_local)
    x5, new_state["down4"] = _down(params["down4"], state["down4"], x4,
                                   train=train, groups=2, policy=policy,
                                   ops=ops, interleaved=dp_local)
    y4, new_state["up1"] = _up(params["up1"], state["up1"], x5, x4,
                               train=train, groups=2, policy=policy,
                               ops=ops, interleaved=dp_local)
    y3, new_state["up2"] = _up(params["up2"], state["up2"], y4, x3,
                               train=train, groups=2, policy=policy,
                               ops=ops, interleaved=dp_local)
    y2, new_state["up3"] = _up(params["up3"], state["up3"], y3, x2,
                               train=train, groups=2, policy=policy,
                               ops=ops, interleaved=dp_local)
    y2 = rs("shallow", y2)

    if dp_local:
        y2s = L.restack_branches(y2)               # restack -> [B,...,256]
    else:
        y2s = jnp.concatenate([y2[:b], y2[b:]], axis=-1)
    up, sc = params["up4"], state["up4"]["conv"]
    u = ops.conv_transpose(y2s, L.bd2(up["up"]["w"]),
                           jnp.tile(up["up"]["b"], 2), policy=policy)
    dh = x1s.shape[1] - u.shape[1]
    dw = x1s.shape[2] - u.shape[2]
    if dh or dw:
        u = jnp.pad(u, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
    xin = jnp.concatenate([x1s, u], axis=-1)           # layout [s1|s2|u1|u2]
    pc = up["conv"]
    h = ops.conv3x3(xin, L.bd2_skip_up(pc["conv1"]["w"], c_skip=c),
                    policy=policy)
    h, s1 = ops.batch_norm(h, pc["bn1"], sc["bn1"], train=train, groups=2,
                           stacked=True)
    h = L.relu(h)
    h = ops.conv3x3(h, L.bd2(pc["conv2"]["w"]), policy=policy)
    h, s2 = ops.batch_norm(h, pc["bn2"], sc["bn2"], train=train, groups=2,
                           stacked=True)
    y1s = L.relu(h)
    new_state["up4"] = {"conv": {"bn1": s1, "bn2": s2}}
    return (x1s, y1s), new_state


def unet_apply(params, state, x, *, train: bool, groups: int = 1,
               policy: Policy = DEFAULT, reshard=None, ops=DEFAULT_OPS):
    """Run the U-Net on an NHWC batch.

    Returns ((local, glob), new_state): ``local`` is the 64-channel output
    of the input DoubleConv, ``glob`` the 64-channel final decoder output.

    ``reshard(tag, x)`` (optional) lets the caller pin shardings under a
    mesh: tag 'deep' marks the H/4-and-smaller levels (replicated over the
    spatial mesh axis — GSPMD's spatially-partitioned conv backward loses
    accuracy on few-row shards), tag 'shallow' restores the spatial
    sharding for the big decoder levels. See train/steps.py.
    """
    rs = reshard or (lambda tag, t: t)
    new_state = {}
    x1, new_state["inc"] = _double_conv(params["inc"], state["inc"], x,
                                        train=train, groups=groups,
                                        policy=policy, ops=ops)
    x2, new_state["down1"] = _down(params["down1"], state["down1"], x1,
                                   train=train, groups=groups, policy=policy,
                                   ops=ops)
    x3, new_state["down2"] = _down(params["down2"], state["down2"], x2,
                                   train=train, groups=groups, policy=policy,
                                   ops=ops)
    x3 = rs("deep", x3)
    x4, new_state["down3"] = _down(params["down3"], state["down3"], x3,
                                   train=train, groups=groups, policy=policy,
                                   ops=ops)
    x5, new_state["down4"] = _down(params["down4"], state["down4"], x4,
                                   train=train, groups=groups, policy=policy,
                                   ops=ops)

    y4, new_state["up1"] = _up(params["up1"], state["up1"], x5, x4,
                               train=train, groups=groups, policy=policy,
                               ops=ops)
    y3, new_state["up2"] = _up(params["up2"], state["up2"], y4, x3,
                               train=train, groups=groups, policy=policy,
                               ops=ops)
    y2, new_state["up3"] = _up(params["up3"], state["up3"], y3, x2,
                               train=train, groups=groups, policy=policy,
                               ops=ops)
    y2 = rs("shallow", y2)
    y1, new_state["up4"] = _up(params["up4"], state["up4"], y2, x1,
                               train=train, groups=groups, policy=policy,
                               ops=ops)
    return (x1, y1), new_state
