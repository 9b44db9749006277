"""Pallas TPU kernels for the Onet head and input preprocessing.

Two fused kernels (the north-star "hot ops" outside the conv stack):

1. ``fused_jsd_head`` — projection dot + pair softmax + the four
   log1pexp JSD terms in ONE pass over the four [B, H, W, C] feature maps,
   with a hand-derived custom VJP whose backward is a second single-pass
   kernel (recompute instead of residuals). The XLA path materializes
   fp32 Vt/Vd/S and several elementwise temps at full resolution; the
   kernel keeps everything in VMEM registers per tile.

2. ``minmax_complement`` — per-frame min-max normalization fused with the
   complementary-pair construction: one read of X producing the stacked
   [2B, H, W, C] network input (normalize + (1 - x) in one pass).

Both kernels fall back to interpret mode off-TPU so the CPU test harness
exercises identical code paths.

BENCHMARK VERDICT (v5e-1, bs=8, 512^2x64 bf16, 2026-08): XLA's automatic
fusion beats both kernels — jsd head fwd+bwd 5.7 ms (XLA) vs 15.9 ms
(pallas); minmax+complement 2.0 ms vs 41.8 ms. The model's non-conv ops are
dense elementwise/reduce chains, exactly what XLA fuses best, while a
sequential-grid pallas kernel pays per-step dispatch and loses automatic
double-buffering. The DEFAULT paths therefore stay on XLA
(models/onet.py::compute_loss, ops/normalize.py); these kernels remain the
exactness-tested kernel-language pathway for ops XLA cannot fuse (future
fused conv+BN, cross-chip pipelines).

Math (per pixel; c indexes channels):
    ct = sum_c Lt, vt = sum_c Lt*Ht   (and likewise cd, vd)
    st = sigmoid(vt - vd), sd = 1 - st
    loss = mean over pixels of
        (l1p(-ct*st) + l1p(ct*sd) + l1p(-cd*sd) + l1p(cd*st)) / 2
which equals models/onet.py::compute_loss exactly (the reference's
broadcast-einsum semantics; Onet_vanilla_20240606.py:221-267).

Backward (per pixel), with s'(x) = sigmoid(x):
    g1 = -s(-ct*st), g2 = s(ct*sd), g3 = -s(-cd*sd), g4 = s(cd*st)
    dct = (g1*st + g2*sd)/(2N),  dcd = (g3*sd + g4*st)/(2N)
    dst = (g1*ct + g4*cd)/(2N),  dsd = (g2*ct + g3*cd)/(2N)
    dvt = (dst - dsd)*st*sd,     dvd = -dvt
    dLt = dct + dvt*Ht, dHt = dvt*Lt, dLd = dcd + dvd*Hd, dHd = dvd*Ld
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onet_tpu.ops.math import log1pexp


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# fused JSD head
# ---------------------------------------------------------------------------

_BLOCK_ROWS = 2048  # pixels per grid step (rows of the [N, C] view)
_LANES = 128


def _head_fwd_kernel(lt, ht, ld, hd, loss_o):
    # blocks are [rows, C]; keepdims reductions stay 2-D for Mosaic
    ltf = lt[:].astype(jnp.float32)
    htf = ht[:].astype(jnp.float32)
    ldf = ld[:].astype(jnp.float32)
    hdf = hd[:].astype(jnp.float32)
    ct = jnp.sum(ltf, axis=-1, keepdims=True)
    cd = jnp.sum(ldf, axis=-1, keepdims=True)
    vt = jnp.sum(ltf * htf, axis=-1, keepdims=True)
    vd = jnp.sum(ldf * hdf, axis=-1, keepdims=True)
    st = jax.nn.sigmoid(vt - vd)
    sd = 1.0 - st
    terms = (log1pexp(-ct * st) + log1pexp(ct * sd)
             + log1pexp(-cd * sd) + log1pexp(cd * st))

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_o[0, 0] = 0.0

    loss_o[0, 0] += jnp.sum(terms)


def _head_bwd_kernel(lt, ht, ld, hd, scale_ref,
                     dlt_o, dht_o, dld_o, dhd_o):
    ltf = lt[:].astype(jnp.float32)
    htf = ht[:].astype(jnp.float32)
    ldf = ld[:].astype(jnp.float32)
    hdf = hd[:].astype(jnp.float32)
    ct = jnp.sum(ltf, axis=-1, keepdims=True)
    cd = jnp.sum(ldf, axis=-1, keepdims=True)
    vt = jnp.sum(ltf * htf, axis=-1, keepdims=True)
    vd = jnp.sum(ldf * hdf, axis=-1, keepdims=True)
    st = jax.nn.sigmoid(vt - vd)
    sd = 1.0 - st
    scale = scale_ref[0, 0]  # cotangent / (2N)
    g1 = -jax.nn.sigmoid(-ct * st)
    g2 = jax.nn.sigmoid(ct * sd)
    g3 = -jax.nn.sigmoid(-cd * sd)
    g4 = jax.nn.sigmoid(cd * st)
    dct = (g1 * st + g2 * sd) * scale
    dcd = (g3 * sd + g4 * st) * scale
    dst = (g1 * ct + g4 * cd) * scale
    dsd = (g2 * ct + g3 * cd) * scale
    dvt = (dst - dsd) * st * sd
    dvd = -dvt
    dlt_o[:] = (dct + dvt * htf).astype(dlt_o.dtype)
    dht_o[:] = (dvt * ltf).astype(dht_o.dtype)
    dld_o[:] = (dcd + dvd * hdf).astype(dld_o.dtype)
    dhd_o[:] = (dvd * ldf).astype(dhd_o.dtype)


def _flatten_pixels(x):
    """[B, H, W, C] -> [N, C]."""
    b, h, w, c = x.shape
    return x.reshape(b * h * w, c)


def _block_rows(n: int) -> int:
    rows = min(_BLOCK_ROWS, n)
    while n % rows or rows % 8:
        rows -= 8
        if rows <= 0:
            return 0
    return rows


def _xla_loss(lt, ht, ld, hd):
    ltf, htf, ldf, hdf = (a.astype(jnp.float32) for a in (lt, ht, ld, hd))
    vt = jnp.sum(ltf * htf, axis=-1)
    vd = jnp.sum(ldf * hdf, axis=-1)
    ct = jnp.sum(ltf, axis=-1)
    cd = jnp.sum(ldf, axis=-1)
    st = jax.nn.sigmoid(vt - vd)
    sd = 1.0 - st
    terms = (log1pexp(-ct * st) + log1pexp(ct * sd)
             + log1pexp(-cd * sd) + log1pexp(cd * st))
    return jnp.sum(terms) / (2.0 * vt.size)


def _head_fwd_call(lt, ht, ld, hd):
    b, h, w, c = lt.shape
    n = b * h * w
    rows = _block_rows(n)
    if rows == 0:  # odd pixel counts: plain XLA fallback
        return _xla_loss(lt, ht, ld, hd)
    grid = (n // rows,)
    flat = [_flatten_pixels(a) for a in (lt, ht, ld, hd)]
    in_spec = pl.BlockSpec((rows, c), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    l_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    loss_sum = pl.pallas_call(
        _head_fwd_kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=l_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(*flat)
    return loss_sum[0, 0] / (2.0 * n)


@jax.custom_vjp
def fused_jsd_loss(lt, ht, ld, hd):
    """The symmetric JSD loss from the four feature maps, one fused pass.

    Training-path kernel: emits only the scalar (Vt/Vd for eval/display
    come from the XLA path, models/onet.py::onet_forward)."""
    return _head_fwd_call(lt, ht, ld, hd)


def _fused_fwd(lt, ht, ld, hd):
    out = _head_fwd_call(lt, ht, ld, hd)
    return out, (lt, ht, ld, hd)


def _fused_bwd(residuals, dloss):
    lt, ht, ld, hd = residuals
    # Vt/Vd cotangents are only used in eval paths (no grad); the loss
    # cotangent drives training.
    b, h, w, c = lt.shape
    n = b * h * w
    rows = _block_rows(n)
    if rows == 0:
        raise NotImplementedError(
            "fused_jsd_head backward needs pixel count divisible by 128; "
            "use models.onet.compute_loss for odd shapes")
    grid = (n // rows,)
    flat = [_flatten_pixels(a) for a in (lt, ht, ld, hd)]
    scale = (dloss / (2.0 * n)).astype(jnp.float32).reshape(1, 1)
    in_spec = pl.BlockSpec((rows, c), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _head_bwd_kernel,
        grid=grid,
        in_specs=[in_spec] * 4 + [s_spec],
        out_specs=(in_spec,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((n, c), a.dtype)
                        for a in (lt, ht, ld, hd)),
        interpret=_interpret(),
    )(*flat, scale)
    return tuple(o.reshape(b, h, w, c) for o in outs)


fused_jsd_loss.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused per-frame min-max normalize + complement pair
# ---------------------------------------------------------------------------

def _minmax_comp_kernel(x_ref, xn_o, xc_o):
    x = x_ref[:].astype(jnp.float32)
    lo = jnp.min(x)
    hi = jnp.max(x)
    xn = (x - lo) / (hi - lo + 1.1920929e-07)
    xn_o[:] = xn.astype(xn_o.dtype)
    xc_o[:] = jnp.clip(1.0 - xn, 0.0, 1.0).astype(xc_o.dtype)


def minmax_complement(x, *, eps_note="np.spacing(1) epsilon as in ops.normalize"):
    """[B, H, W, C] -> (normalized X, clip(1 - X, 0, 1)) in one pass.

    Per-frame min/max over (H, W, C) — the whole-frame ``array_normal``
    normalization fused with the complementary input construction, emitted
    as the stacked network input by ``paired_input``. Channels fold into
    the lane dimension ([B, H, W*C] view) so a C=1 frame is not padded to
    128 lanes.
    """
    b, h, w, c = x.shape
    x3 = x.reshape(b, h, w * c)
    spec = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    xn, xc = pl.pallas_call(
        _minmax_comp_kernel,
        grid=(b,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(x3.shape, x.dtype),
                   jax.ShapeDtypeStruct(x3.shape, x.dtype)),
        interpret=_interpret(),
    )(x3)
    return xn.reshape(x.shape), xc.reshape(x.shape)


def paired_input(x):
    """Fused [B,...] -> [2B,...] (normalized, complement) network input."""
    xn, xc = minmax_complement(x)
    return jnp.concatenate([xn, xc], axis=0)
