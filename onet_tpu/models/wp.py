"""Width-pair-packed (wp) model path: the 512^2-scale U-Net levels run on
the Pallas pair-packed conv kernels (ops/pallas_conv.py) instead of the
XLA block-diagonal channel-stacked form.

Layout through one forward (weight-shared twin, input [B, H, W, cin]):

  inc.conv1 + bn1 + relu   XLA, channel-stacked  [B, H, W, 128]
  pack_wp                  one relayout          [2B, H, W/2, 128]
  inc.conv2 (+BN stats)    PALLAS                stays packed
  bn2-apply + relu         XLA elementwise (custom-VJP full BN backward)
  pool_wp                  packed -> channel-stacked [B, H/2, W/2, 128]
  down1 .. up3             EXISTING stacked/batched path (models/unet.py)
  up4.up (convT)           XLA dot_general, 100% dense, EMITS packed
  up4.conv1 (2-input)      PALLAS (skip_wp, up_wp) — concat never built
  bn1-apply + relu         XLA
  up4.conv2 (+BN stats)    PALLAS
  bn2-apply + relu         XLA
  head                     packed indicator contractions -> [B, H, W, 2]

Numerics contract: same math as unet_apply_stacked up to float
reassociation (conv tap order, stats summation order); masks agree and
gradients land in the fp-noise class (tests/test_wp_path.py). BatchNorm
batch statistics come from the conv kernels' fused epilogue (per-sample
lane sums), which removes the separate stats read pass per 512^2 BN.

Reference behavior being reproduced: Onet_vanilla_20240606.py:39-153
(UNet), :156-191 (twin forward); the packing itself has no reference
counterpart (TPU-native).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L
from onet_tpu.models.unet import _down, _up, DEFAULT_OPS
from onet_tpu.ops.pallas_conv import (
    conv3x3_wp, conv3x3_wp2, pack_wp, unpack_wp)

BN_EPS = L.BN_EPS
BN_MOMENTUM = L.BN_MOMENTUM


# ---------------------------------------------------------------------------
# BatchNorm on packed tensors with kernel-precomputed statistics
# ---------------------------------------------------------------------------

def _fold_stats(s1, s2, cnt):
    """Per-sample lane sums [N, 128] -> per-branch (mean, var) [2, 64].
    Branch b = batch half b; lanes (parity, channel) fold over parity."""
    n = s1.shape[0]
    b = n // 2
    s1f = s1[:, :64] + s1[:, 64:]
    s2f = s2[:, :64] + s2[:, 64:]
    mean = jnp.stack([jnp.sum(s1f[:b], 0), jnp.sum(s1f[b:], 0)]) / cnt
    ex2 = jnp.stack([jnp.sum(s2f[:b], 0), jnp.sum(s2f[b:], 0)]) / cnt
    return mean, ex2 - jnp.square(mean)


def _per_sample(vec2, b):
    """[2, C'] per-branch vectors -> [2B, C'] per-sample (branch=half)."""
    return jnp.repeat(vec2, b, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bn_apply_wp(y, scale, bias, mean, inv, eps):
    """Train-mode BN apply on a packed tensor with PRECOMPUTED per-branch
    batch statistics (mean, inv = rsqrt(var+eps), each [2, 64]).

    The hand-written VJP implements the FULL BatchNorm backward (including
    the statistics' dependence on y), exactly like layers._bn_train_ch —
    the stats args carry zero cotangent (they are a function of y; their
    contribution is folded into the dy formula)."""
    b = y.shape[0] // 2
    sf = scale.astype(jnp.float32)
    a2 = jnp.tile(inv * sf, 2)                                   # [2, 128]
    c2 = jnp.tile(bias.astype(jnp.float32) - mean * inv * sf, 2)
    a_ns = _per_sample(a2, b)[:, None, None, :]
    c_ns = _per_sample(c2, b)[:, None, None, :]
    return (y.astype(jnp.float32) * a_ns + c_ns).astype(y.dtype)


def _bn_apply_wp_fwd(y, scale, bias, mean, inv, eps):
    return bn_apply_wp(y, scale, bias, mean, inv, eps), (y, scale, mean, inv)


def _bn_apply_wp_bwd(eps, res, dy):
    y, scale, mean, inv = res
    n, h, wp, l = y.shape
    b = n // 2
    cnt = b * h * wp * 2                       # per-branch count per channel
    yf = y.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean_ns = _per_sample(jnp.tile(mean, 2), b)[:, None, None, :]
    inv_ns = _per_sample(jnp.tile(inv, 2), b)[:, None, None, :]
    xhat = (yf - mean_ns) * inv_ns
    t_dy = jnp.sum(dyf, axis=(1, 2))                             # [N, 128]
    t_dyx = jnp.sum(dyf * xhat, axis=(1, 2))
    f_dy = t_dy[:, :64] + t_dy[:, 64:]
    f_dyx = t_dyx[:, :64] + t_dyx[:, 64:]
    sum_dy = jnp.stack([jnp.sum(f_dy[:b], 0), jnp.sum(f_dy[b:], 0)])
    sum_dyx = jnp.stack([jnp.sum(f_dyx[:b], 0), jnp.sum(f_dyx[b:], 0)])
    sf = scale.astype(jnp.float32)
    a_ns = _per_sample(jnp.tile(inv * sf, 2), b)[:, None, None, :]
    sd_ns = _per_sample(jnp.tile(sum_dy / cnt, 2), b)[:, None, None, :]
    sdx_ns = _per_sample(jnp.tile(sum_dyx / cnt, 2), b)[:, None, None, :]
    dx = (a_ns * (dyf - sd_ns - xhat * sdx_ns)).astype(y.dtype)
    dscale = jnp.sum(sum_dyx, axis=0).astype(scale.dtype)
    dbias = jnp.sum(sum_dy, axis=0).astype(scale.dtype)
    return dx, dscale, dbias, jnp.zeros_like(mean), jnp.zeros_like(inv)


bn_apply_wp.defvjp(_bn_apply_wp_fwd, _bn_apply_wp_bwd)


def _bn_wp(y, s1, s2, params, state, *, train, momentum=BN_MOMENTUM,
           eps=BN_EPS):
    """BatchNorm on a packed conv output using the kernel's fused stats.
    Returns (normalized y, new_state); running-stats EMA replays the
    reference's sequential order (top branch then down branch), exactly
    like layers.batch_norm."""
    n, h, wp, l = y.shape
    b = n // 2
    if not train:
        inv = lax.rsqrt(state["var"] + eps)
        sf = params["scale"].astype(jnp.float32)
        a2 = jnp.tile(inv * sf, 2)
        c2 = jnp.tile(params["bias"].astype(jnp.float32)
                      - state["mean"] * inv * sf, 2)
        out = (y.astype(jnp.float32) * a2 + c2).astype(y.dtype)
        return out, state
    cnt = b * h * wp * 2
    mean, var = _fold_stats(s1, s2, cnt)
    inv = lax.rsqrt(var + eps)
    out = bn_apply_wp(y, params["scale"], params["bias"], mean, inv, eps)
    unbiased = var * (cnt / max(cnt - 1, 1))
    r_mean, r_var = state["mean"], state["var"]
    for i in range(2):
        r_mean = (1 - momentum) * r_mean + momentum * mean[i]
        r_var = (1 - momentum) * r_var + momentum * unbiased[i]
    new_state = {"mean": lax.stop_gradient(r_mean),
                 "var": lax.stop_gradient(r_var)}
    return out, new_state


def _conv_stats_eval(y):
    """Eval mode ignores batch stats; the kernel still emits them (cheap)."""
    return y


# ---------------------------------------------------------------------------
# pool: packed -> channel-stacked, exact first-match backward
# ---------------------------------------------------------------------------

@jax.custom_vjp
def pool_wp(x):
    """2x2 max pool on a packed [2B, H, Wp, 128] tensor, emitting the
    CHANNEL-STACKED [B, H/2, Wp, 128] tensor the mid-network consumes.
    Backward uses torch/XLA first-match tie semantics in window order
    (r0,c0), (r0,c1), (r1,c0), (r1,c1)."""
    return _pool_wp_val(x)


def _pool_wp_val(x):
    n = x.shape[0]
    b = n // 2
    m1 = jnp.maximum(x[..., :64], x[..., 64:])       # over column parity
    m2 = jnp.maximum(m1[:, ::2], m1[:, 1::2])        # over row pairs
    return jnp.concatenate([m2[:b], m2[b:]], axis=-1)


def _pool_wp_fwd(x):
    return _pool_wp_val(x), x


def _pool_wp_bwd(x, g):
    n, h, wp, l = x.shape
    b = n // 2
    gb = jnp.concatenate([g[..., :64], g[..., 64:]], axis=0)  # [2B,H/2,Wp,64]
    a = x[:, ::2, :, :64]
    bb = x[:, ::2, :, 64:]
    c = x[:, 1::2, :, :64]
    d = x[:, 1::2, :, 64:]
    m = jnp.maximum(jnp.maximum(a, bb), jnp.maximum(c, d))
    ea = a == m
    eb = (bb == m) & ~ea
    ec = (c == m) & ~ea & ~eb
    ed = (d == m) & ~ea & ~eb & ~ec
    gf = gb.astype(x.dtype)
    da = jnp.where(ea, gf, 0)
    db = jnp.where(eb, gf, 0)
    dc = jnp.where(ec, gf, 0)
    dd = jnp.where(ed, gf, 0)
    row0 = jnp.concatenate([da, db], axis=-1)        # packed lanes (p, c)
    row1 = jnp.concatenate([dc, dd], axis=-1)
    dx = jnp.stack([row0, row1], axis=2).reshape(n, h, wp, l)
    return (dx,)


pool_wp.defvjp(_pool_wp_fwd, _pool_wp_bwd)


# ---------------------------------------------------------------------------
# transposed conv: channel-stacked input -> packed output, fully dense
# ---------------------------------------------------------------------------

def convT_wp(y2s, w, bias, *, policy: Policy = DEFAULT):
    """Kernel-2 stride-2 ConvTranspose on the channel-stacked decoder
    tensor [B, Hs, Ws, 2*cin], emitting the PACKED [2B, 2Hs, Ws, 128]
    up-tensor directly: y[2i+di, 2j+dj] = x[i,j] @ w[di,dj] means each
    output row-parity di is ONE dense [.., cin] x [cin, 128] matmul with
    lanes (dj, cout) — no block-diagonal duplication, no lane padding
    (torch ConvTranspose2d semantics; vs the reference's decoder up-conv,
    Onet_vanilla_20240606.py:75-101)."""
    b, hs, ws, c2 = y2s.shape
    cin = c2 // 2
    xb = jnp.concatenate([y2s[..., :cin], y2s[..., cin:]], axis=0)
    xb = policy.cast_compute(xb)
    # w: [2, 2, cin, cout] -> per di a [cin, 2*cout] matrix, lanes (dj, c)
    wdt = policy.cast_compute(w)
    cout = w.shape[-1]
    rows = []
    for di in range(2):
        wm = jnp.transpose(wdt[di], (1, 0, 2)).reshape(cin, 2 * cout)
        rows.append(lax.dot_general(
            xb, wm, (((3,), (0,)), ((), ())), precision=policy.precision,
            preferred_element_type=jnp.float32))
    y = jnp.stack(rows, axis=2).reshape(2 * b, 2 * hs, ws, 2 * cout)
    return (y + jnp.tile(bias, 2).astype(jnp.float32)).astype(xb.dtype)


# ---------------------------------------------------------------------------
# head reductions on packed features
# ---------------------------------------------------------------------------

def head_wp(loc_wp, glob_wp):
    """(v, lsum) [B, H, W, 2] from packed features: per-pixel 64-channel
    dot and channel sum per branch (stacked_head semantics on the packed
    layout; Onet_vanilla_20240606.py:176,182,231-232)."""
    n, h, wp, l = loc_wp.shape
    b = n // 2
    sel = jnp.concatenate([
        jnp.concatenate([jnp.ones((64, 1), jnp.float32),
                         jnp.zeros((64, 1), jnp.float32)], 1),
        jnp.concatenate([jnp.zeros((64, 1), jnp.float32),
                         jnp.ones((64, 1), jnp.float32)], 1)], 0)
    prod = loc_wp.astype(jnp.float32) * glob_wp.astype(jnp.float32)
    dims = (((3,), (0,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST
    vpp = lax.dot_general(prod, sel, dims, precision=hi,
                          preferred_element_type=jnp.float32)
    lpp = lax.dot_general(loc_wp.astype(jnp.float32), sel, dims,
                          precision=hi, preferred_element_type=jnp.float32)
    # [2B, H, Wp, 2(parity)] -> per-branch [B, H, W] (free reshape), pair
    v = jnp.stack([vpp[:b].reshape(b, h, 2 * wp),
                   vpp[b:].reshape(b, h, 2 * wp)], axis=-1)
    lsum = jnp.stack([lpp[:b].reshape(b, h, 2 * wp),
                      lpp[b:].reshape(b, h, 2 * wp)], axis=-1)
    return v, lsum


# ---------------------------------------------------------------------------
# the wp U-Net forward
# ---------------------------------------------------------------------------

def unet_apply_wp(params, state, x_stacked, *, train: bool,
                  policy: Policy = DEFAULT):
    """Weight-shared twin pass with the 512^2 levels on the Pallas
    pair-packed kernels. ``x_stacked`` is [B, H, W, 2*in_ch] (branch blocks
    on channels, like unet_apply_stacked). Returns ((loc_wp, glob_wp),
    new_state) with both features PACKED [2B, H, W/2, 128]."""
    new_state = {}
    bsz = x_stacked.shape[0]
    p, s = params["inc"], state["inc"]

    # inc.conv1 + bn1 + relu: XLA channel-stacked (cin is tiny)
    h = L.conv3x3(x_stacked, L.bd2(p["conv1"]["w"]), policy=policy)
    h, s1 = L.batch_norm(h, p["bn1"], s["bn1"], train=train, groups=2,
                         stacked=True)
    h = L.relu(h)
    hp = pack_wp(policy.cast_compute(h))            # the one entry relayout

    # inc.conv2: pallas + fused stats
    y, st1, st2 = conv3x3_wp(hp, policy.cast_compute(p["conv2"]["w"]))
    if train:
        y, s2 = _bn_wp(y, st1, st2, p["bn2"], s["bn2"], train=True)
    else:
        y, s2 = _bn_wp(y, None, None, p["bn2"], s["bn2"], train=False)
    x1_wp = L.relu(y)
    new_state["inc"] = {"bn1": s1, "bn2": s2}

    # pool (packed -> channel-stacked) and the unchanged mid-network
    hp2 = pool_wp(x1_wp)

    p1, s1d = params["down1"], state["down1"]
    h = L.conv3x3(hp2, L.bd2(p1["conv1"]["w"]), policy=policy)
    h, sb1 = L.batch_norm(h, p1["bn1"], s1d["bn1"], train=train, groups=2,
                          stacked=True)
    h = L.relu(h)
    c1 = h.shape[-1] // 2
    xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
    xb = L.conv3x3(xb, p1["conv2"]["w"], policy=policy)
    xb, sb2 = L.batch_norm(xb, p1["bn2"], s1d["bn2"], train=train, groups=2)
    x2 = L.relu(xb)
    new_state["down1"] = {"bn1": sb1, "bn2": sb2}

    x3, new_state["down2"] = _down(params["down2"], state["down2"], x2,
                                   train=train, groups=2, policy=policy)
    x4, new_state["down3"] = _down(params["down3"], state["down3"], x3,
                                   train=train, groups=2, policy=policy)
    x5, new_state["down4"] = _down(params["down4"], state["down4"], x4,
                                   train=train, groups=2, policy=policy)
    y4, new_state["up1"] = _up(params["up1"], state["up1"], x5, x4,
                               train=train, groups=2, policy=policy)
    y3, new_state["up2"] = _up(params["up2"], state["up2"], y4, x3,
                               train=train, groups=2, policy=policy)
    y2, new_state["up3"] = _up(params["up3"], state["up3"], y3, x2,
                               train=train, groups=2, policy=policy)

    # decoder top: convT emits packed; two-input conv eats (skip, up)
    y2s = jnp.concatenate([y2[:bsz], y2[bsz:]], axis=-1)
    up, sc = params["up4"], state["up4"]["conv"]
    u_wp = convT_wp(y2s, up["up"]["w"], up["up"]["b"], policy=policy)
    # (odd-size pad path not supported in wp; guarded by caller shape check)

    pc = up["conv"]
    wc1 = pc["conv1"]["w"]
    c_skip = 64
    ya, sa1, sa2 = conv3x3_wp2(
        x1_wp, u_wp,
        policy.cast_compute(wc1[:, :, :c_skip]),
        policy.cast_compute(wc1[:, :, c_skip:]))
    if train:
        ya, su1 = _bn_wp(ya, sa1, sa2, pc["bn1"], sc["bn1"], train=True)
    else:
        ya, su1 = _bn_wp(ya, None, None, pc["bn1"], sc["bn1"], train=False)
    ya = L.relu(ya)

    yb, sb1_, sb2_ = conv3x3_wp(ya, policy.cast_compute(pc["conv2"]["w"]))
    if train:
        yb, su2 = _bn_wp(yb, sb1_, sb2_, pc["bn2"], sc["bn2"], train=True)
    else:
        yb, su2 = _bn_wp(yb, None, None, pc["bn2"], sc["bn2"], train=False)
    y1_wp = L.relu(yb)
    new_state["up4"] = {"conv": {"bn1": su1, "bn2": su2}}
    return (x1_wp, y1_wp), new_state


# ---------------------------------------------------------------------------
# the wp serving (BN-folded) forward
# ---------------------------------------------------------------------------

def unet_infer_wp(fp, x_stacked, *, policy: Policy):
    """BN-folded serving forward with the 512^2 levels on the pair-packed
    kernels: conv + bias + ReLU fused into each kernel's store epilogue
    (models/infer.py::unet_infer_stacked is the XLA counterpart). Returns
    packed (loc_wp, glob_wp)."""
    from onet_tpu.models import infer as I
    from onet_tpu.ops.pallas_conv import (
        conv3x3_wp_raw, conv3x3_wp2_raw, make_wc_we, INTERPRET)

    bsz = x_stacked.shape[0]
    h = I._cbr_stacked(x_stacked, fp["inc"]["conv1"], policy)
    hp = pack_wp(policy.cast_compute(h))
    dt = hp.dtype

    def cbr_wp(xp, site):
        wc, we = make_wc_we(policy.cast_compute(site["w"]), dtype=dt)
        return conv3x3_wp_raw(xp, wc, we, bias=jnp.tile(site["b"], 2),
                              bias_relu=True, interpret=INTERPRET)

    x1_wp = cbr_wp(hp, fp["inc"]["conv2"])
    hp2 = _pool_wp_val(x1_wp)                       # packed -> stacked

    # mid-network: identical to unet_infer_stacked from down1 onward
    hh = I._cbr_stacked(hp2, fp["down1"]["conv1"], policy)
    c1 = hh.shape[-1] // 2
    xb = jnp.concatenate([hh[..., :c1], hh[..., c1:]], axis=0)
    feats = [None]
    hcur = I._conv_bias_relu(xb, fp["down1"]["conv2"], policy)
    feats.append(hcur)
    for i in range(2, 5):
        hcur = I._dconv_infer(fp[f"down{i}"], I.max_pool_2x2(hcur), policy)
        feats.append(hcur)
    y = feats[-1]
    for i in range(1, 4):
        up = fp[f"up{i}"]["up"]
        y = I.conv_transpose_2x2(y, up["w"], up["b"], policy=policy)
        skip = feats[4 - i]
        dh = skip.shape[1] - y.shape[1]
        dw = skip.shape[2] - y.shape[2]
        if dh or dw:
            y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2),
                            (dw // 2, dw - dw // 2), (0, 0)))
        y = I._dconv_infer(fp[f"up{i}"]["conv"],
                           jnp.concatenate([skip, y], axis=-1), policy)
    y2s = jnp.concatenate([y[:bsz], y[bsz:]], axis=-1)

    up = fp["up4"]["up"]
    u_wp = convT_wp(y2s, up["w"], up["b"], policy=policy)
    pc = fp["up4"]["conv"]
    wc1 = policy.cast_compute(pc["conv1"]["w"])
    wca, wea = make_wc_we(wc1[:, :, :64], dtype=dt)
    wcb, web = make_wc_we(wc1[:, :, 64:], dtype=dt)
    ya = conv3x3_wp2_raw(x1_wp, u_wp, wca, wea, wcb, web,
                         bias=jnp.tile(pc["conv1"]["b"], 2),
                         bias_relu=True, interpret=INTERPRET)
    y1_wp = cbr_wp(ya, pc["conv2"])
    return x1_wp, y1_wp


def wp_supported(x_shape, base: int) -> bool:
    """The wp path covers the production geometry: base-64 weight-shared
    nets on even H/W with H a multiple of 8 (kernel row blocks) and W a
    multiple of 4. Everything else falls back to the stacked path."""
    h, w = x_shape[1], x_shape[2]
    return base == 64 and h % 8 == 0 and w % 4 == 0 and w >= 8
