"""Native-layout 3x3 conv with fused BatchNorm-stats epilogue (Pallas, TPU).

THE QUESTION THIS MODULE ANSWERS (round-3 verdict, perf item). The round-3
pair-packed kernels (ops/pallas_conv.py) fused the BN batch statistics into
the conv epilogue and won standalone, but every in-graph measurement wrapped
them in pack_wp/unpack_wp relayouts that ate the win. The one unmeasured
lever was a stats-epilogue conv at the NATIVE channel-stacked layout —
[N, H, W, 128] with block-diagonal weights (models/layers.py::bd2), exactly
the tensors the production graph already carries — so the fused stats come
with NO relayout at the boundaries.

THE KERNEL. Same row-block structure as the pair-packed family (the halo
window assembly and grid are shared via imports): per grid step, assemble
[rblk+2] input rows, build the two column-shifted operands in VMEM scratch,
and accumulate NINE dense [m, 128] x [128, 128] matmuls (one per kernel
tap) into an f32 accumulator — the same 2x-padded FLOPs the XLA
block-diagonal conv performs (50% useful), no more, no less. The epilogue
accumulates per-lane sum and sum-of-squares of the f32 accumulator: in the
stacked layout, lanes ARE (branch, channel) pairs, so per-lane sums over
batch+pixels are precisely the per-branch-group BatchNorm batch statistics
(models/layers.py::_bn_train) — the separate stats read pass over the 512^2
conv output disappears.

Arithmetic stakes (SOL.md round 3): vs XLA the kernel trades the separate
~2.6 ms stats pass at each 512^2 site against Pallas per-block fixed cost
(~12 us/block measured round 3) on HALF the blocks the pair-packed form
needed (branches stay in lanes: N=B, not 2B). Whether that nets out
positive is what runs/bd_epilogue_probe.py measures on the real chip.

Reference anchor: the DoubleConv whose BN stats are the tail is
Onet_vanilla_20240606.py:39-58; the three 512^2 stacked sites in the Onet
are inc.conv2, up4.conv1 (two-input concat form), up4.conv2.

Parity contract: exact (up to f32 reassociation of the 9-tap sum) with
lax.conv_general_dilated on the same stacked layout; tested in
tests/test_pallas_conv_bd.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onet_tpu.ops.pallas_conv import (  # shared plumbing, measured round 3
    L, _fill_row_window, _pick_rblk)


def _bd_cparams():
    """The native-layout kernel stages ~3x the window scratch of the
    pair-packed one (full-width rows plus two shifted copies), so the
    raised scoped-VMEM cap applies at every block size."""
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)


def _shifted_operands(xs, a0, a2, wd):
    """a0[:, j] = xs[:, j-1] (zero at j=0) — the dj=0 tap operand;
    a2[:, j] = xs[:, j+1] (zero at j=wd-1) — the dj=2 tap operand."""
    zcol = jnp.zeros((xs.shape[0], L), xs.dtype)
    a0[:, 1:] = xs[:, : wd - 1]
    a0[:, 0] = zcol
    a2[:, : wd - 1] = xs[:, 1:]
    a2[:, wd - 1] = zcol


def _accum_taps(acc, xs, a0, a2, w_ref, rblk, m):
    for di in range(3):
        for dj, src in ((0, a0), (1, xs), (2, a2)):
            xc = src[di:di + rblk].reshape(m, L)
            acc += jnp.dot(xc, w_ref[di, dj],
                           preferred_element_type=jnp.float32)
    return acc


def _store_stats(acc, hb, s1_ref, s2_ref):
    s1 = jnp.sum(acc, axis=0)
    s2 = jnp.sum(jnp.square(acc), axis=0)

    @pl.when(hb == 0)
    def _():
        s1_ref[0, 0] = s1
        s2_ref[0, 0] = s2

    @pl.when(hb > 0)
    def _():
        s1_ref[0, 0] += s1
        s2_ref[0, 0] += s2


def _bd_fwd_kernel(x_any, xb_ref, w_ref, y_ref, *rest,
                   rblk, hblk, wd, stats):
    # With stats=False the s1/s2 out refs are not allocated at all
    # (advisor r4: avoid the dead HBM writeback), so unpack positionally.
    if stats:
        s1_ref, s2_ref, xs, a0, a2, sem = rest
    else:
        xs, a0, a2, sem = rest
    n = pl.program_id(0)
    hb = pl.program_id(1)
    r0 = hb * rblk

    _fill_row_window(x_any, xb_ref, xs, sem, n, hb, r0, rblk, hblk)
    _shifted_operands(xs, a0, a2, wd)

    m = rblk * wd
    acc = jnp.zeros((m, L), jnp.float32)
    acc = _accum_taps(acc, xs, a0, a2, w_ref, rblk, m)
    y_ref[0] = acc.reshape(rblk, wd, L).astype(y_ref.dtype)
    if stats:
        _store_stats(acc, hb, s1_ref, s2_ref)


def _bd_fwd2_kernel(xa_any, xa_ref, xb_any, xb_ref, wa_ref, wb_ref,
                    y_ref, *rest, rblk, hblk, wd, stats):
    """Two-input variant: y = conv(xa, wa) + conv(xb, wb) — the decoder's
    concat(skip, up) conv without materializing the 256-lane concat.
    Scratch is shared serially between the inputs (18 matmuls/block)."""
    if stats:
        s1_ref, s2_ref, xs, a0, a2, sem = rest
    else:
        xs, a0, a2, sem = rest
    n = pl.program_id(0)
    hb = pl.program_id(1)
    r0 = hb * rblk
    m = rblk * wd
    acc = jnp.zeros((m, L), jnp.float32)

    for x_any, x_ref, w_ref in ((xa_any, xa_ref, wa_ref),
                                (xb_any, xb_ref, wb_ref)):
        _fill_row_window(x_any, x_ref, xs, sem, n, hb, r0, rblk, hblk)
        _shifted_operands(xs, a0, a2, wd)
        acc = _accum_taps(acc, xs, a0, a2, w_ref, rblk, m)

    y_ref[0] = acc.reshape(rblk, wd, L).astype(y_ref.dtype)
    if stats:
        _store_stats(acc, hb, s1_ref, s2_ref)


def _bd_plumbing(n, h, wd, rblk, hblk, out_dtype, stats):
    out_shape = [
        jax.ShapeDtypeStruct((n, h, wd, L), out_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, rblk, wd, L), lambda n, hb: (n, hb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if stats:
        out_shape += [
            jax.ShapeDtypeStruct((n, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, L), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, 1, L), lambda n, hb: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda n, hb: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    scratch = [
        pltpu.VMEM((rblk + 2, wd, L), jnp.bfloat16),
        pltpu.VMEM((rblk + 2, wd, L), jnp.bfloat16),
        pltpu.VMEM((rblk + 2, wd, L), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return out_shape, out_specs, scratch


def conv3x3_bd_raw(x, w, *, rblk: int = 16, stats: bool = False,
                   out_dtype=None, interpret: bool = False):
    """SAME 3x3 conv at the native stacked layout, optional stats epilogue.

    x: [N, H, W, 128] channel-stacked; w: [3, 3, 128, 128] dense (the
    block-diagonal bd2 weight, or any dense 128->128 kernel). Returns y
    [N, H, W, 128] (out_dtype, default x.dtype); with ``stats=True`` also
    (s1, s2) each [N, 128] f32 — per-sample per-lane sum and sum-of-squares
    of the f32 conv output (reduce over the batch axis for the BatchNorm
    batch statistics).
    """
    n, h, wd, l = x.shape
    assert l == L and w.shape == (3, 3, L, L), (x.shape, w.shape)
    rblk = _pick_rblk(h, rblk)
    hblk = h // rblk
    out_dtype = out_dtype or x.dtype
    x = x.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)

    kern = functools.partial(_bd_fwd_kernel, rblk=rblk, hblk=hblk, wd=wd,
                             stats=stats)
    out_shape, out_specs, scratch = _bd_plumbing(n, h, wd, rblk, hblk,
                                                 out_dtype, stats)
    out = pl.pallas_call(
        kern,
        grid=(n, hblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # halo-row fetches
            pl.BlockSpec((1, rblk, wd, L),           # bulk rows, pipelined
                         lambda n, hb: (n, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=_bd_cparams(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * L * L * 9,
            bytes_accessed=int(x.size * 2 * (1 + 2 / rblk)
                               + n * h * wd * L
                               * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x, x, w)
    if stats:
        y, s1, s2 = out
        return y, s1[:, 0, :], s2[:, 0, :]
    return out[0]


def conv3x3_bd2in_raw(xa, xb, wa, wb, *, rblk: int = 16,
                      stats: bool = False, out_dtype=None,
                      interpret: bool = False):
    """Two-input native-layout conv: y = conv(xa, wa) + conv(xb, wb) —
    the decoder's concat(skip, up) site with the stacked-skip |
    stacked-up split already in hand (models/layers.py::bd2_skip_up
    layout). Same output contract as conv3x3_bd_raw."""
    n, h, wd, l = xa.shape
    assert l == L and xb.shape == xa.shape, (xa.shape, xb.shape)
    assert wa.shape == (3, 3, L, L) and wb.shape == (3, 3, L, L)
    rblk = _pick_rblk(h, rblk)
    hblk = h // rblk
    out_dtype = out_dtype or xa.dtype
    xa = xa.astype(jnp.bfloat16)
    xb = xb.astype(jnp.bfloat16)
    wa = wa.astype(jnp.bfloat16)
    wb = wb.astype(jnp.bfloat16)

    kern = functools.partial(_bd_fwd2_kernel, rblk=rblk, hblk=hblk, wd=wd,
                             stats=stats)
    out_shape, out_specs, scratch = _bd_plumbing(n, h, wd, rblk, hblk,
                                                 out_dtype, stats)
    blocked = pl.BlockSpec((1, rblk, wd, L), lambda n, hb: (n, hb, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n, hblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY), blocked,
            pl.BlockSpec(memory_space=pl.ANY), blocked,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=_bd_cparams(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * L * L * 18,
            bytes_accessed=int(2 * xa.size * 2 * (1 + 2 / rblk)
                               + n * h * wd * L
                               * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xa, xa, xb, xb, wa, wb)
    if stats:
        y, s1, s2 = out
        return y, s1[:, 0, :], s2[:, 0, :]
    return out[0]


def xla_conv_stats(x, w):
    """The production formulation the kernel competes against: XLA conv at
    the stacked layout + the separate per-lane stats pass (the read the
    epilogue eliminates). Used by the probe and the exactness tests."""
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2))
    s2 = jnp.sum(jnp.square(yf), axis=(1, 2))
    return y, s1, s2
