"""Functional NN layers for the TPU U-Net.

Design notes (TPU-first, not a port):

* Layout is NHWC end-to-end — the native layout for TPU convolutions.
* Parameters and batch-norm state are plain nested dicts (pytrees); every
  layer is a pure function ``y, new_state = f(params, state, x, ...)``.
* Convolutions run in the policy's compute dtype (bf16 in production) with
  float32 accumulation (``preferred_element_type``); BatchNorm statistics
  are always float32.
* ``groups``-aware BatchNorm: the Onet feeds the *same* BN layers twice per
  step — once with X and once with 1-X (reference runs two sequential
  passes through shared weights, Onet_vanilla_20240606.py:174-182). We
  instead run ONE [2B, H, W, C] batch for full MXU utilization and recover
  identical numerics by computing BN statistics per branch-group
  (reshape to [G, N/G, ...], reduce within each group). Running statistics
  replay the reference's sequential EMA update order (top pass then down
  pass) in closed form.

Behavioral parity citations: DoubleConv/Down/Up/UNet structure mirrors
Onet_vanilla_20240606.py:39-153; weight init mirrors the Kaiming scheme at
:125-140 (ConvTranspose2d keeps torch's default kaiming-uniform(a=sqrt(5))
because the reference's init loop only matches nn.Conv2d).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.policy import Policy, DEFAULT

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def kaiming_normal_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming normal, fan_in, relu gain: std = sqrt(2 / (cin*kh*kw))."""
    fan_in = cin * kh * kw
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, (kh, kw, cin, cout), dtype)


def torch_default_convT(key, kh, kw, cin, cout, dtype=jnp.float32):
    """torch's default ConvTranspose2d init.

    kaiming_uniform(a=sqrt(5)) on a [cin, cout, kh, kw] weight; torch's
    fan_in convention for that shape is cout*kh*kw. Bias ~ U(+-1/sqrt(fan)).
    Stored here as HWIO ([kh, kw, cin, cout]).
    """
    kw_key, b_key = jax.random.split(key)
    fan_in = cout * kh * kw
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    w = jax.random.uniform(kw_key, (kh, kw, cin, cout), dtype, -bound, bound)
    b_bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(b_key, (cout,), dtype, -b_bound, b_bound)
    return w, b


def bn_init(c, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv3x3(x, w, *, policy: Policy = DEFAULT):
    """3x3 stride-1 SAME conv, no bias (reference Conv2d(bias=False)).

    Output stays in the compute dtype: the TPU MXU accumulates bf16
    products in fp32 internally, and keeping operand/result dtypes equal
    keeps the conv VJP well-typed. The following BatchNorm upcasts to
    fp32 for statistics.
    """
    y = lax.conv_general_dilated(
        policy.cast_compute(x),
        policy.cast_compute(w),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMNUMS,
        precision=policy.precision,
    )
    return y


# Trace-time A/B switches for the hand-written VJPs (benchmark hygiene:
# each lever measured in isolation on the real chip; defaults = fastest).
USE_CUSTOM_POOL_VJP = True
USE_CUSTOM_CT_VJP = True
USE_CUSTOM_BN_VJP = True


def max_pool_2x2(x):
    if USE_CUSTOM_POOL_VJP:
        return _pool_custom(x)
    return _pool_reduce_window(x)


def _pool_reduce_window(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@jax.custom_vjp
def _pool_custom(x):
    """2x2 stride-2 max pool: reshape-max forward, select_and_scatter
    backward.

    Forward: reshape-max (identical values to reduce_window) — fuses into
    the surrounding elementwise chain where reduce_window would not,
    measured -28 ms on the full-size inference graph. Backward: XLA's own
    transpose of reduce_window (select_and_scatter, first-match ties, torch
    semantics) — hand-written elementwise backwards were measured SLOWER
    in-graph (+6 ms eq-mask, +37 ms first-match cumsum) despite winning as
    standalone microbenchmarks; the fwd value computation inside jax.vjp is
    dead-code-eliminated since select_and_scatter only needs (x, g).
    """
    return _pool_val(x)


def _pool_val(x):
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        # torch MaxPool2d(2) floor semantics: drop the trailing row/col
        # (NAU's 200^2 reaches odd 25^2 at down3)
        x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


def _pool_fwd(x):
    return _pool_val(x), x


def _pool_bwd(x, g):
    _, vjp_fn = jax.vjp(_pool_reduce_window, x)
    (dx,) = vjp_fn(g)
    return (dx,)


_pool_custom.defvjp(_pool_fwd, _pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_transpose_core(x, w, precision):
    """y[n, 2i+di, 2j+dj, o] = sum_c x[n,i,j,c] * w[di,dj,c,o].

    Forward uses the native fractionally-strided conv with a spatially
    reversed kernel (lax.conv_transpose applies the mirrored taps; the flip
    restores torch ConvTranspose2d semantics — exact-equality tested).

    Backward is hand-written: XLA's automatic transpose of conv_transpose
    materializes big-tensor `reverse` copies and runs ~9x slower than the
    equivalent direct convolutions (measured at the up2 decoder shape).
      dx[n,i,j,c]    = sum_{di,dj,o} g[n,2i+di,2j+dj,o] w[di,dj,c,o]
                     -> stride-2 VALID conv of g with w^T (in/out swapped)
      dw[di,dj,c,o]  = sum_{n,i,j} x[n,i,j,c] g[n,2i+di,2j+dj,o]
                     -> 4 strided slices of g, each a [C, NHW]x[NHW, O]
                        contraction on the MXU
    """
    return lax.conv_transpose(
        x, w[::-1, ::-1], (2, 2), "VALID", dimension_numbers=_DIMNUMS,
        precision=precision,
    )


def _ct_fwd(x, w, precision):
    return _conv_transpose_core(x, w, precision), (x, w)


def _ct_bwd(precision, res, g):
    x, w = res
    dx = lax.conv_general_dilated(
        g, jnp.transpose(w, (0, 1, 3, 2)), (2, 2), "VALID",
        dimension_numbers=_DIMNUMS,
        precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    n, h, w_sp, c = x.shape
    o = g.shape[-1]
    # dw via ONE contraction: reshape g [N,2H,2W,O] -> [N,H,2,W,2,O] (free,
    # splits non-minor dims) and contract (n,i,j) against x, keeping (di,dj)
    # in the output — the four strided slices g[:, di::2, dj::2, :] this
    # replaces lowered to 16 gather fusions (~4.8 ms/step at the bench
    # shape).
    g6 = g.reshape(n, h, 2, w_sp, 2, o)
    dw = lax.dot_general(
        x, g6, (((0, 1, 2), (0, 1, 3)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)          # [C, 2, 2, O]
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)   # [2, 2, C, O]
    return dx, dw


_conv_transpose_core.defvjp(_ct_fwd, _ct_bwd)


def conv_transpose_2x2(x, w, b, *, policy: Policy = DEFAULT):
    """Kernel-2 stride-2 transposed conv + bias (torch ConvTranspose2d)."""
    if USE_CUSTOM_CT_VJP:
        y = _conv_transpose_core(policy.cast_compute(x),
                                 policy.cast_compute(w), policy.precision)
    else:
        y = lax.conv_transpose(
            policy.cast_compute(x), policy.cast_compute(w[::-1, ::-1]),
            (2, 2), "VALID", dimension_numbers=_DIMNUMS,
            precision=policy.precision)
    return y + b.astype(y.dtype)


def bd2(w):
    """Block-diagonal duplication of a shared conv weight.

    [kh, kw, ci, co] -> [kh, kw, 2ci, 2co] with w on both diagonal blocks
    and zeros off-diagonal: a dense conv with this weight on channel-stacked
    inputs [.., 2ci] computes both weight-shared branches exactly (the zero
    blocks contribute exact +0 terms). Used to run the 64-channel U-Net
    levels as 128-channel convs: XLA pads 64-lane tensors to 128 lanes in
    HBM AND on the MXU, so the dense 2x-FLOP form is faster than two
    half-lane passes and halves every elementwise/BN/pool read at 512^2.
    """
    z = jnp.zeros_like(w)
    top = jnp.concatenate([w, z], axis=3)
    bot = jnp.concatenate([z, w], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def interleave_branches(h):
    """Channel-stacked [N, H, W, 2C] -> batch-INTERLEAVED [2N, H, W, C]
    (sample-major: out[2i + b] = branch b of sample i).

    This is the dp-friendly unstack: when the batch axis is sharded over a
    mesh's data axis, every output element stays on the device that owns
    its source sample, so plain-jit GSPMD inserts NO resharding
    collectives. The block form (concat [branch0 batch | branch1 batch])
    instead splits each device's shard across the array midpoint and was
    measured redistributing 3.7 GB/step of activations at dp8
    (runs/project_v5e8.py, RESULTS.md round 4).
    """
    n, hh, ww, c2 = h.shape
    c = c2 // 2
    return (h.reshape(n, hh, ww, 2, c)
            .transpose(0, 3, 1, 2, 4)
            .reshape(2 * n, hh, ww, c))


def restack_branches(y):
    """Batch-interleaved [2N, H, W, C] -> channel-stacked [N, H, W, 2C]
    (lane blocks [branch0 | branch1] — the bd2 convention). Inverse of
    interleave_branches; equally local under batch sharding."""
    n2, hh, ww, c = y.shape
    n = n2 // 2
    return (y.reshape(n, 2, hh, ww, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(n, hh, ww, 2 * c))


def bd2_skip_up(w, c_skip: int):
    """bd2 for the decoder conv whose per-branch input is concat(skip, up)
    but whose channel-stacked global input is laid out [s1|s2|u1|u2]
    (concatenating the stacked skip with the stacked up output directly,
    avoiding an activation re-interleave pass). Per-branch w is
    [kh, kw, c_skip + c_up, co]."""
    ws, wu = w[:, :, :c_skip, :], w[:, :, c_skip:, :]
    zs, zu = jnp.zeros_like(ws), jnp.zeros_like(wu)
    rows = [
        jnp.concatenate([ws, zs], axis=3),   # s1 -> branch-0 outputs
        jnp.concatenate([zs, ws], axis=3),   # s2 -> branch-1 outputs
        jnp.concatenate([wu, zu], axis=3),   # u1 -> branch-0
        jnp.concatenate([zu, wu], axis=3),   # u2 -> branch-1
    ]
    return jnp.concatenate(rows, axis=2)


def _group_view(groups, interleaved):
    """(reshape axes, reduce axes, [G,C]-broadcaster) for a grouped batch.

    Block layout reshapes [N,...] -> [G, N/G, ...] (branch b = contiguous
    slab b); interleaved layout — what interleave_branches emits, the
    dp-local form — reshapes to [N/G, G, ...] (branch b = every G-th
    sample starting at b). Group index ALWAYS means branch b either way,
    so the running-stats EMA order is layout-independent.
    """
    if interleaved:
        return (lambda t, n, h, w, c, g: t.reshape(n // g, g, h, w, c),
                (0, 2, 3),
                lambda t: t[None, :, None, None, :])
    return (lambda t, n, h, w, c, g: t.reshape(g, n // g, h, w, c),
            (1, 2, 3),
            lambda t: t[:, None, None, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bn_train(x, scale, bias, groups, eps, interleaved=False):
    """Train-mode BN core: per-branch-group statistics, shared affine.

    Returns (y, mean, var) with mean/var [G, C] float32 (biased variance,
    used by the caller's EMA under an implicit stop-gradient: the backward
    treats the mean/var cotangents as zero, which is exact for our usage —
    the running-stats path is never differentiated).

    Hand-written VJP: saves only the bf16 conv output plus the [G, C]
    statistics and recomputes x_hat on the fly, so the backward reads
    (x, dy) twice with no float32 activation materialization — XLA's
    automatic differentiation of the float32-upcast formulation was
    spending ~15 ms/step on convert/copy fusions at the 512^2 levels.

    ``interleaved`` selects the batch-interleaved branch layout (see
    _group_view); statistics are identical either way — only which batch
    indices belong to which branch changes.
    """
    y, mean, var, _ = _bn_train_fwd_impl(x, scale, bias, groups, eps,
                                         interleaved)
    return y, mean, var


def _bn_train_fwd_impl(x, scale, bias, groups, eps, interleaved=False):
    n, h, w, c = x.shape
    g = groups
    view, red, bcast = _group_view(g, interleaved)
    xf = view(x, n, h, w, c, g).astype(jnp.float32)
    mean = jnp.mean(xf, axis=red)                                # [G, C]
    var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
    inv = lax.rsqrt(var + eps)                                    # [G, C]
    y = (xf - bcast(mean)) * bcast(inv * scale.astype(jnp.float32))
    y = (y + bias.astype(jnp.float32)).reshape(n, h, w, c).astype(x.dtype)
    return y, mean, var, inv


def _bn_train_fwd(x, scale, bias, groups, eps, interleaved=False):
    y, mean, var, inv = _bn_train_fwd_impl(x, scale, bias, groups, eps,
                                           interleaved)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_train_bwd(groups, eps, interleaved, res, cts):
    dy, _dmean, _dvar = cts            # running-stats path: zero cotangents
    x, scale, mean, inv = res
    n, h, w, c = x.shape
    g = groups
    cnt = (n // g) * h * w
    view, red, bcast = _group_view(g, interleaved)
    xg = view(x, n, h, w, c, g).astype(jnp.float32)
    dyg = view(dy, n, h, w, c, g).astype(jnp.float32)
    xhat = (xg - bcast(mean)) * bcast(inv)
    sum_dy = jnp.sum(dyg, axis=red)                              # [G, C]
    sum_dy_xhat = jnp.sum(dyg * xhat, axis=red)                  # [G, C]
    sf = scale.astype(jnp.float32)
    dx = (bcast(inv * sf)
          * (dyg - bcast(sum_dy / cnt) - xhat * bcast(sum_dy_xhat / cnt)))
    dx = dx.reshape(n, h, w, c).astype(x.dtype)
    dscale = jnp.sum(sum_dy_xhat, axis=0).astype(scale.dtype)    # [C]
    dbias = jnp.sum(sum_dy, axis=0).astype(scale.dtype)          # [C]
    return dx, dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train_ch(x, scale, bias, groups, eps):
    """Train-mode BN for CHANNEL-stacked branches: x is [N, H, W, G*C] with
    branch b living in channel block [b*C, (b+1)*C); statistics are plain
    per-channel batch stats (each channel belongs to exactly one branch),
    the shared affine is tiled across blocks. Returns (y, mean, var) with
    mean/var [G, C] exactly like _bn_train (same EMA path)."""
    y, mean, var, _ = _bn_train_ch_fwd_impl(x, scale, bias, groups, eps)
    return y, mean, var


def _bn_train_ch_fwd_impl(x, scale, bias, groups, eps):
    c2 = x.shape[-1]
    c = c2 // groups
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))                          # [G*C]
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    scale2 = jnp.tile(scale.astype(jnp.float32), groups)
    bias2 = jnp.tile(bias.astype(jnp.float32), groups)
    y = ((xf - mean) * (inv * scale2) + bias2).astype(x.dtype)
    return y, mean.reshape(groups, c), var.reshape(groups, c), inv


def _bn_train_ch_fwd(x, scale, bias, groups, eps):
    y, mean, var, inv = _bn_train_ch_fwd_impl(x, scale, bias, groups, eps)
    return (y, mean, var), (x, scale, mean.reshape(-1), inv)


def _bn_train_ch_bwd(groups, eps, res, cts):
    dy, _dmean, _dvar = cts
    x, scale, mean, inv = res                                    # mean [G*C]
    n, h, w, c2 = x.shape
    c = c2 // groups
    cnt = n * h * w
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * inv
    sum_dy = jnp.sum(dyf, axis=(0, 1, 2))                        # [G*C]
    sum_dy_xhat = jnp.sum(dyf * xhat, axis=(0, 1, 2))            # [G*C]
    scale2 = jnp.tile(scale.astype(jnp.float32), groups)
    dx = ((inv * scale2)
          * (dyf - sum_dy / cnt - xhat * (sum_dy_xhat / cnt))).astype(x.dtype)
    dscale = jnp.sum(sum_dy_xhat.reshape(groups, c), axis=0).astype(scale.dtype)
    dbias = jnp.sum(sum_dy.reshape(groups, c), axis=0).astype(scale.dtype)
    return dx, dscale, dbias


_bn_train_ch.defvjp(_bn_train_ch_fwd, _bn_train_ch_bwd)


def batch_norm(x, params, state, *, train: bool, groups: int = 1,
               momentum: float = BN_MOMENTUM, eps: float = BN_EPS,
               stacked: bool = False, interleaved: bool = False):
    """BatchNorm2d with branch-group statistics.

    ``groups=G`` treats the leading batch axis as G stacked branches of
    N/G frames each and normalizes every branch with its own batch
    statistics — numerically identical to running the branches through the
    layer sequentially (what the weight-shared reference does), while the
    surrounding convs still see one fused [N, H, W, C] batch.
    ``interleaved=True`` flips the branch layout from contiguous slabs to
    sample-major interleave (branch b = batch indices i*G + b — what
    interleave_branches emits; local under dp batch sharding).

    ``stacked=True`` instead treats the CHANNEL axis as G stacked branch
    blocks of C channels each (x is [N, H, W, G*C], params/state stay [C]):
    per-channel batch statistics are per-branch automatically, the affine
    is tiled. Used by the channel-stacked shallow U-Net levels.

    Running stats replay torch's per-call EMA in branch order:
        r <- (1-m) r + m s_0 ; r <- (1-m) r + m s_1 ; ...
    Normalization uses biased variance, the EMA uses unbiased variance
    (torch semantics). Returns (y, new_state).
    """
    c = len(params["scale"])
    if stacked and not train:
        mean2 = jnp.tile(state["mean"], groups)
        inv2 = lax.rsqrt(jnp.tile(state["var"], groups) + eps)
        scale2 = jnp.tile(params["scale"].astype(jnp.float32), groups)
        bias2 = jnp.tile(params["bias"].astype(jnp.float32), groups)
        y = (x.astype(jnp.float32) - mean2) * inv2 * scale2 + bias2
        return y.astype(x.dtype), state
    if train:
        n, h, w, _ = x.shape
        cnt = (n // (1 if stacked else groups)) * h * w
        if stacked:
            y, mean, var = _bn_train_ch(x, params["scale"], params["bias"],
                                        groups, eps)
        elif USE_CUSTOM_BN_VJP:
            y, mean, var = _bn_train(x, params["scale"], params["bias"],
                                     groups, eps, interleaved)
        else:
            view, red, bcast = _group_view(groups, interleaved)
            xg = view(x, n, h, w, c, groups).astype(jnp.float32)
            mean = jnp.mean(xg, axis=red)
            var = jnp.mean(jnp.square(xg), axis=red) - jnp.square(mean)
            inv = lax.rsqrt(var + eps)
            y = (xg - bcast(mean)) * bcast(inv)
            y = y.reshape(n, h, w, c)
            y = (y * params["scale"].astype(jnp.float32)
                 + params["bias"].astype(jnp.float32)).astype(x.dtype)
        # closed-form sequential EMA over the G branch statistics
        unbiased = var * (cnt / max(cnt - 1, 1))
        r_mean, r_var = state["mean"], state["var"]
        for i in range(groups):
            r_mean = (1 - momentum) * r_mean + momentum * mean[i]
            r_var = (1 - momentum) * r_var + momentum * unbiased[i]
        new_state = {"mean": lax.stop_gradient(r_mean),
                     "var": lax.stop_gradient(r_var)}
        return y, new_state
    inv = lax.rsqrt(state["var"] + eps)
    y = (x.astype(jnp.float32) - state["mean"]) * inv
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), state


def relu(x):
    return jnp.maximum(x, 0)
