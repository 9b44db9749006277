"""Int8 post-training-quantized serving path.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate, and int8
activations halve the HBM traffic of the serving graph. This module
quantizes the BN-folded inference graph (models/infer.py) with:

* symmetric per-output-channel weight scales,
* per-site static activation scales from a calibration pass,
* concat inputs handled exactly by folding each segment's activation scale
  into the corresponding weight rows BEFORE weight quantization (a conv of
  a mixed-scale concat is then a plain int8 conv),
* ReLU folded into the requantization clamp (post-ReLU activations live in
  [0, 127]),
* max-pool on the int8 tensor directly (max commutes with the monotone
  quantization map).

This is an OPT-IN serving mode, additive to the reference surface (the
reference serves f32 torch; parity claims in PARITY.md are for the bf16
path). Accuracy contract: >= 99% mask agreement with the bf16 folded graph
(tests/test_quant.py; bench.py reports the int8 rate as a detail line,
never as the headline).

Reference workload shape: Onet_vanilla_20240606.py:104-153.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.models.layers import (bd2, bd2_skip_up,
                                    interleave_branches,
                                    restack_branches)
from onet_tpu.models.onet import stacked_head
from onet_tpu.ops.normalize import complement

_DIMNUMS = ("NHWC", "HWIO", "NHWC")
QMAX = 127.0


# ---------------------------------------------------------------------------
# calibration: record per-site input max on the bf16 folded graph
# ---------------------------------------------------------------------------

# conv sites of the stacked folded graph, in execution order. Sites whose
# input is a concat carry one scale per segment.
SITES = (
    "inc.conv1", "inc.conv2", "down1.conv1", "down1.conv2",
    "down2.conv1", "down2.conv2", "down3.conv1", "down3.conv2",
    "down4.conv1", "down4.conv2",
    "up1.up", "up1.conv1", "up1.conv2",
    "up2.up", "up2.conv1", "up2.conv2",
    "up3.up", "up3.conv1", "up3.conv2",
    "up4.up", "up4.conv1", "up4.conv2",
)


def _site_max(x):
    """Per-channel abs-max over (B, H, W): [C] float32. Per-channel
    activation scales cost nothing at runtime (they fold into the next
    conv's weight rows) and buy ~large accuracy: post-BN-fold channel
    ranges differ by orders of magnitude."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))


def calibrate(folded, x, *, bias: float = 0.0, policy=None):
    """Run the bf16 stacked folded graph on a calibration batch and return
    {site: max_abs_input} (floats). ``x`` is [B, H, W, cin] in [0, 1]."""
    from onet_tpu.core.policy import BF16_COMPUTE
    from onet_tpu.models import infer as I

    policy = policy or BF16_COMPUTE

    @jax.jit
    def collect(fp, xb):
        taps = {}

        def record(name, t):
            taps[name] = _site_max(t)
            return t

        _stacked_folded_with_taps(I, fp, xb, bias, policy, record)
        return taps

    import numpy as np
    taps = collect(folded["top"], x)
    return {k: np.asarray(v) for k, v in jax.device_get(taps).items()}


def _stacked_folded_with_taps(I, fp, x, bias, policy, tap):
    """Mirror of infer.unet_infer_stacked with a tap before every conv.
    Concat sites tap each segment separately ('<site>:skip'/'<site>:up')."""
    xd = complement(x, bias)
    xx = jnp.concatenate([x, xd], axis=-1)
    b = xx.shape[0]
    h = I._cbr_stacked(tap("inc.conv1", xx), fp["inc"]["conv1"], policy)
    x1s = I._cbr_stacked(tap("inc.conv2", h), fp["inc"]["conv2"], policy)
    hp = I.max_pool_2x2(x1s)
    h = I._cbr_stacked(tap("down1.conv1", hp), fp["down1"]["conv1"], policy)
    # block restack (the serving default). Calibration stats are max-abs
    # over the whole tensor / per channel, so they are invariant to the
    # batch permutation dp_local=True applies at execution time — one
    # calibration serves both layouts.
    c1 = h.shape[-1] // 2
    xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
    feats = [None]
    hcur = I._conv_bias_relu(tap("down1.conv2", xb), fp["down1"]["conv2"],
                             policy)
    feats.append(hcur)
    for i in range(2, 5):
        hp = I.max_pool_2x2(hcur)
        hcur = I._conv_bias_relu(tap(f"down{i}.conv1", hp),
                                 fp[f"down{i}"]["conv1"], policy)
        hcur = I._conv_bias_relu(tap(f"down{i}.conv2", hcur),
                                 fp[f"down{i}"]["conv2"], policy)
        feats.append(hcur)
    y = feats[-1]
    for i in range(1, 4):
        up = fp[f"up{i}"]["up"]
        y = I.conv_transpose_2x2(tap(f"up{i}.up", y), up["w"], up["b"],
                                 policy=policy)
        skip = feats[4 - i]
        y = _pad_match(y, skip)
        tap(f"up{i}.conv1:skip", skip)
        y = jnp.concatenate([skip, tap(f"up{i}.conv1:up", y)], axis=-1)
        y = I._conv_bias_relu(y, fp[f"up{i}"]["conv"]["conv1"], policy)
        y = I._conv_bias_relu(tap(f"up{i}.conv2", y),
                              fp[f"up{i}"]["conv"]["conv2"], policy)
    y2s = jnp.concatenate([y[:b], y[b:]], axis=-1)
    up = fp["up4"]["up"]
    u = I.conv_transpose_2x2(tap("up4.up", y2s), bd2(up["w"]),
                             jnp.tile(up["b"], 2), policy=policy)
    u = _pad_match(u, x1s)
    tap("up4.conv1:skip", x1s)
    xin = jnp.concatenate([x1s, tap("up4.conv1:up", u)], axis=-1)
    c = x1s.shape[-1] // 2
    pc = fp["up4"]["conv"]
    hh = I._cbr_stacked(xin, pc["conv1"], policy,
                        wmap=lambda w: bd2_skip_up(w, c_skip=c))
    y1s = I._cbr_stacked(tap("up4.conv2", hh), pc["conv2"], policy)
    return x1s, y1s


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------

def _quant_w(w_eff):
    """Symmetric per-output-channel int8 quantization of [kh,kw,ci,co]."""
    sw = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / QMAX
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(w_eff / sw), -QMAX, QMAX).astype(jnp.int8)
    return wq, sw.astype(jnp.float32)


def _qsite(w, b, sx_vec):
    """Quantize one conv site. ``sx_vec`` is the per-input-channel
    activation scale vector [ci] (constant per segment); it folds into the
    weight so the int8 conv consumes raw int8 codes."""
    w_eff = w.astype(jnp.float32) * sx_vec[None, None, :, None]
    wq, sw = _quant_w(w_eff)
    return {"wq": wq, "sw": sw, "b": b.astype(jnp.float32)}


def quantize_folded(folded, scales, *, in_scale: float = 1.0 / QMAX):
    """Build the int8 serving params from BN-folded params + calibration
    scales (the dict from ``calibrate``). Weight-shared stacked graph only.

    Activation code contract: every tensor entering a conv is int8 in
    [0, 127] with real value = code * s_site (post-ReLU sites), except the
    input which uses ``in_scale`` on [0, 1] values.
    """
    fp = folded["top"]
    # per-channel max -> per-code scale vectors [C]
    s = {k: jnp.maximum(jnp.asarray(v, jnp.float32) / QMAX, 1e-12)
         for k, v in scales.items()}

    def vec(site, ci):
        v = s[site]
        assert v.shape == (ci,), (site, v.shape, ci)
        return v

    q = {"in_scale": in_scale, "scales": s}
    cin2 = fp["inc"]["conv1"]["w"].shape[2] * 2
    q["inc.conv1"] = _qsite(bd2(fp["inc"]["conv1"]["w"]),
                            jnp.tile(fp["inc"]["conv1"]["b"], 2),
                            jnp.full((cin2,), in_scale, jnp.float32))
    q["inc.conv2"] = _qsite(bd2(fp["inc"]["conv2"]["w"]),
                            jnp.tile(fp["inc"]["conv2"]["b"], 2),
                            vec("inc.conv2",
                                fp["inc"]["conv2"]["w"].shape[2] * 2))
    q["down1.conv1"] = _qsite(bd2(fp["down1"]["conv1"]["w"]),
                              jnp.tile(fp["down1"]["conv1"]["b"], 2),
                              vec("down1.conv1",
                                  fp["down1"]["conv1"]["w"].shape[2] * 2))
    q["down1.conv2"] = _qsite(fp["down1"]["conv2"]["w"],
                              fp["down1"]["conv2"]["b"],
                              vec("down1.conv2",
                                  fp["down1"]["conv2"]["w"].shape[2]))
    for i in range(2, 5):
        for cname in ("conv1", "conv2"):
            site = f"down{i}.{cname}"
            w = fp[f"down{i}"][cname]["w"]
            q[site] = _qsite(w, fp[f"down{i}"][cname]["b"],
                             vec(site, w.shape[2]))
    for i in range(1, 4):
        up = fp[f"up{i}"]["up"]
        site = f"up{i}.up"
        q[site] = _qsite(up["w"][::-1, ::-1], up["b"],
                         vec(site, up["w"].shape[2]))
        wc1 = fp[f"up{i}"]["conv"]["conv1"]["w"]
        c_up = wc1.shape[2] // 2  # concat(skip, up): skip first
        c_skip = wc1.shape[2] - c_up
        sx_vec = jnp.concatenate([s[f"up{i}.conv1:skip"],
                                  s[f"up{i}.conv1:up"]])
        assert sx_vec.shape == (wc1.shape[2],)
        q[f"up{i}.conv1"] = _qsite(wc1, fp[f"up{i}"]["conv"]["conv1"]["b"],
                                   sx_vec)
        wc2 = fp[f"up{i}"]["conv"]["conv2"]["w"]
        q[f"up{i}.conv2"] = _qsite(wc2, fp[f"up{i}"]["conv"]["conv2"]["b"],
                                   vec(f"up{i}.conv2", wc2.shape[2]))
    up = fp["up4"]["up"]
    q["up4.up"] = _qsite(bd2(up["w"][::-1, ::-1]), jnp.tile(up["b"], 2),
                         vec("up4.up", up["w"].shape[2] * 2))
    pc = fp["up4"]["conv"]
    c_skip = pc["conv1"]["w"].shape[2] - pc["conv1"]["w"].shape[3]
    wstk = bd2_skip_up(pc["conv1"]["w"], c_skip=c_skip)
    cs2 = c_skip * 2
    sx_vec = jnp.concatenate([s["up4.conv1:skip"], s["up4.conv1:up"]])
    assert sx_vec.shape == (wstk.shape[2],)
    q["up4.conv1"] = _qsite(wstk, jnp.tile(pc["conv1"]["b"], 2), sx_vec)
    q["up4.conv2"] = _qsite(bd2(pc["conv2"]["w"]),
                            jnp.tile(pc["conv2"]["b"], 2),
                            vec("up4.conv2", pc["conv2"]["w"].shape[2] * 2))
    # bf16 head-feature sites (see onet_infer_q docstring)
    q["inc.conv2.bf16"] = {"w": bd2(fp["inc"]["conv2"]["w"]),
                           "b": jnp.tile(fp["inc"]["conv2"]["b"], 2)
                           .astype(jnp.float32)}
    q["up4.conv2.bf16"] = {"w": bd2(pc["conv2"]["w"]),
                           "b": jnp.tile(pc["conv2"]["b"], 2)
                           .astype(jnp.float32)}
    return q


# ---------------------------------------------------------------------------
# int8 execution
# ---------------------------------------------------------------------------

def _conv_bf16(x16, site):
    y = lax.conv_general_dilated(
        x16, site["w"].astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=_DIMNUMS)
    return y.astype(jnp.float32) + site["b"]


def _conv_i8(xq, site, strides=(1, 1), padding="SAME", lhs_dilation=None):
    y = lax.conv_general_dilated(
        xq, site["wq"], strides, padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * site["sw"] + site["b"]


def _requant(y, s_next):
    """ReLU + quantize to the next site's input codes (clamp handles both:
    post-ReLU codes live in [0, 127])."""
    return jnp.clip(jnp.round(y / s_next), 0.0, QMAX).astype(jnp.int8)


def _requant_signed(y, s_next):
    """Symmetric signed quantization for tensors that are NOT post-ReLU —
    the four conv-transpose outputs feed the decoder concats unrectified;
    clamping them at 0 destroyed every negative value (mask agreement 92%
    regardless of bit depth until this was found)."""
    return jnp.clip(jnp.round(y / s_next), -QMAX, QMAX).astype(jnp.int8)


def _cbr_q(xq, site, s_next):
    return _requant(_conv_i8(xq, site), s_next)


def _pool_q(xq):
    n, h, w, c = xq.shape
    if h % 2 or w % 2:
        # torch MaxPool2d(2) floor semantics (layers._pool_val): NAU's 200^2
        # reaches odd 25^2 at down3
        xq = xq[:, : h // 2 * 2, : w // 2 * 2, :]
    xr = xq.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


def _pad_match(y, skip):
    """Zero-pad a decoder tensor to the skip's spatial size (the reference's
    asymmetric F.pad, Onet_vanilla_20240606.py:92-96). Zero codes decode to
    0.0 under both unsigned and signed requantization, so the pad is exact
    in int8 as well as bf16."""
    dh = skip.shape[1] - y.shape[1]
    dw = skip.shape[2] - y.shape[2]
    if dh or dw:
        y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
    return y


def _convT_q(xq, site):
    """Kernel-2 stride-2 transposed conv in int8, via the same primitive the
    bf16 path uses (quantize_folded stores the pre-reversed kernel, matching
    infer.conv_transpose_2x2's w[::-1, ::-1] argument)."""
    return lax.conv_transpose(
        xq, site["wq"], (2, 2), "VALID",
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * site["sw"] + site["b"]


def onet_infer_q(q, x, *, bias: float = 0.0, head_bf16: bool = True,
                 dp_local: bool = False):
    """Int8 serving forward: [B, H, W, cin] in [0, 1] ->
    (S [B, H, W, 2] f32, labels [B, H, W]). Weight-shared stacked graph.

    ``head_bf16`` keeps the two convs PRODUCING the head features
    (inc.conv2 -> L, up4.conv2 -> H) in bf16 — the projection <L, H>
    contracts 64 products per pixel, so head-feature noise multiplies.
    They cost ~20% of the int8 graph's time (512^2 at bf16 rate);
    head_bf16=False runs all 22 sites int8 — validate agreement on your
    checkpoint first (runs/quant_validate.py measures both).
    """
    s = q["scales"]
    xd = complement(x, bias)
    xx = jnp.concatenate([x, xd], axis=-1)
    b = x.shape[0]
    xq = jnp.clip(jnp.round(xx / q["in_scale"]), 0.0, QMAX).astype(jnp.int8)
    h = _cbr_q(xq, q["inc.conv1"], s["inc.conv2"])
    if head_bf16:
        # bf16 head-feature conv on the dequantized codes
        hf16 = (h.astype(jnp.float32) * s["inc.conv2"]).astype(jnp.bfloat16)
        x1f = _conv_bf16(hf16, q["inc.conv2.bf16"])
    else:
        x1f = _conv_i8(h, q["inc.conv2"])
    x1q = _requant(x1f, s["up4.conv1:skip"])    # skip codes for up4
    hp = _pool_q(_requant(x1f, s["down1.conv1"]))
    # down1.conv1's output is channel-stacked; its consumer down1.conv2 is
    # calibrated on the batch-unstacked tensor, so tile its [C] scale
    h = _cbr_q(hp, q["down1.conv1"], jnp.tile(s["down1.conv2"], 2))
    if dp_local:                  # shard-local restack under plain-jit dp
        xb = interleave_branches(h)
    else:
        c1 = h.shape[-1] // 2
        xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
    feats = [None]
    skip_scale = {1: s["up3.conv1:skip"], 2: s["up2.conv1:skip"],
                  3: s["up1.conv1:skip"]}
    hf = _conv_i8(xb, q["down1.conv2"])
    feats.append(_requant(hf, skip_scale[1]))   # int8 skip codes
    hq = _requant(hf, s["down2.conv1"])
    for i in range(2, 5):
        hq = _pool_q(hq)
        hq = _cbr_q(hq, q[f"down{i}.conv1"], s[f"down{i}.conv2"])
        hf = _conv_i8(hq, q[f"down{i}.conv2"])
        if i < 4:
            feats.append(_requant(hf, skip_scale[i]))
            hq = _requant(hf, s[f"down{i+1}.conv1"])
        else:
            feats.append(None)                  # bottleneck is not a skip
            hq = _requant(hf, s["up1.up"])
    y = hq
    for i in range(1, 4):
        yf = _convT_q(y, q[f"up{i}.up"])
        yq = _requant_signed(yf, s[f"up{i}.conv1:up"])
        skq = feats[4 - i]
        yq = _pad_match(yq, skq)
        xin = jnp.concatenate([skq, yq], axis=-1)
        y = _cbr_q(xin, q[f"up{i}.conv1"], s[f"up{i}.conv2"])
        yf = _conv_i8(y, q[f"up{i}.conv2"])
        if i < 3:
            y = _requant(yf, s[f"up{i+1}.up"])
        else:
            # restack to channel form BEFORE requanting: up4.up's per-channel
            # scales are calibrated on the channel-stacked tensor and the two
            # branch blocks requantize differently
            y2f = (restack_branches(yf) if dp_local else
                   jnp.concatenate([yf[:b], yf[b:]], axis=-1))
            y = _requant(y2f, s["up4.up"])
    uf = _convT_q(y, q["up4.up"])
    uq = _requant_signed(uf, s["up4.conv1:up"])
    uq = _pad_match(uq, x1q)
    # NOTE (round-3 A/B): splitting this concat+conv into two summed convs
    # was measured SLOWER (217 vs 225 t/s) — the int32 partial sums break
    # the conv->requant fusion and double the HBM writes. The 512^2 int8
    # sites are HBM-bound (~400-460 GiB/s effective), so the single fused
    # concat conv stands.
    xin = jnp.concatenate([x1q, uq], axis=-1)
    h = _cbr_q(xin, q["up4.conv1"], s["up4.conv2"])
    if head_bf16:
        hf16 = (h.astype(jnp.float32) * s["up4.conv2"]).astype(jnp.bfloat16)
        y1f = _conv_bf16(hf16, q["up4.conv2.bf16"])
    else:
        y1f = _conv_i8(h, q["up4.conv2"])
    # head on the ReLU'd features in bf16 (the bf16 serving path's head
    # reads bf16 too; keeps the two 512^2 feature tensors at half traffic)
    loc = jnp.maximum(x1f, 0.0).astype(jnp.bfloat16)
    glob = jnp.maximum(y1f, 0.0).astype(jnp.bfloat16)
    v, _ = stacked_head(loc, glob)
    sfm = jax.nn.softmax(v, axis=-1)
    return sfm, jnp.argmax(sfm, axis=-1)
