"""Opt-in reduced-precision (int8) TRAINING arithmetic.

WHY. SOL.md derives that bf16-exact training of the 31M Onet caps combined
train+infer throughput near 130 t/s/chip even under perfect execution —
the 250/chip north star is reachable only with reduced-precision training
arithmetic. The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate
(394 TOPS vs 197 TF/s), so quantizing the convolution FORWARD (and
optionally the input-gradient) roughly halves the cost of those passes.

WHAT. ``make_qtrain_ops(level)`` returns an ops namespace (the injection
point of models/unet.py) whose 3x3 convs run:

  level "fwd":    int8 forward (dynamic per-tensor activation scale,
                  per-output-channel weight scales), bf16 backward from
                  the int8-dequantized residuals (straight-through).
  level "fwd+dx": additionally the input-gradient conv in int8 (dynamic
                  signed quantization of the incoming cotangent);
                  the weight-gradient stays bf16 always — Adam's moment
                  estimates need gradient precision.

BatchNorm, pooling, the transposed convs, the head and the loss stay in
the exact bf16/f32 path; BatchNorm renormalizes every conv output, which
is what makes the forward quantization noise (~0.4% per site) benign.

ACCURACY CONTRACT. Same shape as int8 serving (models/quant.py): opt-in,
gated on mask agreement of the TRAINED model vs a bf16-trained model from
the same init/data (tests/test_qtrain.py on CPU; runs/qtrain_validate.py
full-size on TPU). This is an ADDITIVE capability over the reference
(which trains f32 only; Train_Onet_on_simclutter_20250407.py:43-45).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L

_DIMNUMS = ("NHWC", "HWIO", "NHWC")
QMAX = 127.0


def _quant_act(x):
    """Dynamic per-tensor symmetric int8: returns (codes, scale).

    Full-tensor amax: a strided row subsample was measured SLOWER (the
    gather copy costs more than the fused reduce saves; 45.0 vs 48.4
    tiles/s at the bench shape) — XLA fuses this reduce with the
    quantize pass."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s = jnp.maximum(amax / QMAX, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -QMAX, QMAX)
    return q.astype(jnp.int8), s


def _quant_w_oc(w):
    """Per-output-channel symmetric int8 weights: (codes, scale[co])."""
    sw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / QMAX
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -QMAX, QMAX)
    return wq.astype(jnp.int8), sw


def _conv_i8(xq, wq, strides=(1, 1), padding="SAME"):
    return lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_q(x, w, compute_dtype, dx_int8):
    """3x3 SAME conv with int8 forward arithmetic.

    Forward: quantize x per-tensor and w per-output-channel, int8 MXU conv,
    dequantize to ``compute_dtype``. Backward (straight-through on the
    quantization): dx from the dequantized weights, dw from the
    dequantized activations — both exactly what the forward multiplied.
    """
    y, _res = _conv_q_fwd_impl(x, w)
    return y.astype(compute_dtype)


def _conv_q_fwd_impl(x, w):
    xq, sx = _quant_act(x)
    wq, sw = _quant_w_oc(w)
    y = _conv_i8(xq, wq).astype(jnp.float32) * (sx * sw)
    return y, (xq, sx, wq, sw)


def _conv_q_fwd(x, w, compute_dtype, dx_int8):
    y, res = _conv_q_fwd_impl(x, w)
    return y.astype(compute_dtype), res


def _conv_q_bwd(compute_dtype, dx_int8, res, dy):
    """Straight-through backward from the DEQUANTIZED residuals: dx and dw
    are the cotangents of the bf16 conv over exactly the values the
    forward multiplied (xdeq, wdeq). dx optionally runs in int8 (dy's
    per-channel sw fold requantized into one signed int8 operand)."""
    xq, sx, wq, sw = res
    dyf = dy.astype(jnp.bfloat16)
    xdeq = (xq.astype(jnp.float32) * sx).astype(jnp.bfloat16)
    wdeq = (wq.astype(jnp.float32) * sw).astype(jnp.bfloat16)

    def ref_conv(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, (1, 1), "SAME", dimension_numbers=_DIMNUMS)

    _, vjp = jax.vjp(ref_conv, xdeq, wdeq)
    dx_bf16, dw = vjp(dyf)
    if dx_int8:
        # dx = corr(dy * sw_per_channel, wq^T flipped): fold the weight
        # codes' per-output-channel scale into dy, then one int8 conv
        wtq = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))
        dyq2, sdy2 = _quant_act(dyf.astype(jnp.float32) * sw)
        dx = (_conv_i8(dyq2, wtq).astype(jnp.float32) * sdy2)
    else:
        dx = dx_bf16
    return dx.astype(compute_dtype), dw.astype(jnp.float32)


conv3x3_q.defvjp(_conv_q_fwd, _conv_q_bwd)


def make_qtrain_ops(*, level: str = "fwd") -> types.SimpleNamespace:
    """Ops namespace for models/unet.py with int8 conv arithmetic.

    level: "fwd" (int8 forward only) or "fwd+dx" (also int8
    input-gradient). Pool / BN / convT stay on the exact default ops.
    """
    assert level in ("fwd", "fwd+dx"), level
    dx_int8 = level == "fwd+dx"

    def conv3x3(x, w, *, policy: Policy = DEFAULT):
        return conv3x3_q(policy.cast_compute(x), w,
                         policy.compute_dtype, dx_int8)

    return types.SimpleNamespace(
        conv3x3=conv3x3,
        batch_norm=L.batch_norm,
        max_pool=L.max_pool_2x2,
        conv_transpose=L.conv_transpose_2x2,
    )
