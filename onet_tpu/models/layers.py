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


def max_pool_2x2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def conv_transpose_2x2(x, w, b, *, policy: Policy = DEFAULT):
    """Kernel-2 stride-2 transposed conv: y[n, 2i+di, 2j+dj, o] =
    sum_c x[n,i,j,c] * w[di,dj,c,o] + b[o].

    Uses the native fractionally-strided conv with a spatially reversed
    kernel (lax.conv_transpose applies the mirrored taps; the flip restores
    torch ConvTranspose2d semantics — exact-equality tested). The earlier
    einsum+reshape formulation forced XLA to materialize a 6-D transpose
    copy, 5x slower at the decoder shapes.
    """
    y = lax.conv_transpose(
        policy.cast_compute(x),
        policy.cast_compute(w[::-1, ::-1]),
        (2, 2),
        "VALID",
        dimension_numbers=_DIMNUMS,
        precision=policy.precision,
    )
    return y + b.astype(y.dtype)


def batch_norm(x, params, state, *, train: bool, groups: int = 1,
               momentum: float = BN_MOMENTUM, eps: float = BN_EPS):
    """BatchNorm2d with branch-group statistics.

    ``groups=G`` treats the leading batch axis as G stacked branches of
    N/G frames each and normalizes every branch with its own batch
    statistics — numerically identical to running the branches through the
    layer sequentially (what the weight-shared reference does), while the
    surrounding convs still see one fused [N, H, W, C] batch.

    Running stats replay torch's per-call EMA in branch order:
        r <- (1-m) r + m s_0 ; r <- (1-m) r + m s_1 ; ...
    Normalization uses biased variance, the EMA uses unbiased variance
    (torch semantics). Returns (y, new_state).
    """
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    if train:
        n, h, w, _ = xf.shape
        g = groups
        xg = xf.reshape(g, n // g, h, w, c)
        cnt = (n // g) * h * w
        mean = jnp.mean(xg, axis=(1, 2, 3))                      # [G, C]
        var = jnp.mean(jnp.square(xg), axis=(1, 2, 3)) - jnp.square(mean)
        inv = lax.rsqrt(var + eps)
        y = (xg - mean[:, None, None, None, :]) * inv[:, None, None, None, :]
        y = y.reshape(n, h, w, c)
        # closed-form sequential EMA over the G branch statistics
        unbiased = var * (cnt / max(cnt - 1, 1))
        r_mean, r_var = state["mean"], state["var"]
        for i in range(groups):
            r_mean = (1 - momentum) * r_mean + momentum * mean[i]
            r_var = (1 - momentum) * r_var + momentum * unbiased[i]
        new_state = {"mean": r_mean, "var": r_var}
    else:
        inv = lax.rsqrt(state["var"] + eps)
        y = (xf - state["mean"]) * inv
        new_state = state
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


def relu(x):
    return jnp.maximum(x, 0)
