"""Width-pair-packed 3x3 convolution kernels (Pallas, TPU).

THE PROBLEM. The Onet's shallow U-Net levels carry 64 channels per branch
(reference arch: Onet_vanilla_20240606.py:104-121). XLA lane-pads 64-channel
NHWC tensors to the TPU's 128-lane tiles in HBM and on the MXU, so the
fastest XLA formulation found in rounds 1-2 channel-stacks the two
weight-shared complementary branches into dense 128-lane tensors with
block-diagonal weights (models/layers.py::bd2) — exact, but it computes
2x the useful conv FLOPs (half of every MXU pass multiplies structural
zeros).

THE FIX. Pack WIDTH PAIRS into the lane dimension instead of branches:
a per-branch [N, H, W, 64] tensor becomes [N, H, W/2, 128] with lane
index p*64 + c for pixel parity p = w % 2 (branches ride the batch axis).
A 3x3 conv then decomposes, per kernel row di, into TWO dense
[M, 128] x [128, 128] matmuls per output block:

  center  y[:, j] += x[:, j]  @ Wc[di]   (all 4 parity quadrants useful)
  edge    y[:, j] += ae[:, j] @ We[di]   (2 of 4 quadrants useful)

where ae[:, j] = [x[:, j-1, p=1 lanes] | x[:, j+1, p=0 lanes]] gathers the
two cross-pair taps, and

  Wc[di] = [[W[di,1], W[di,0]],     We[di] = [[W[di,0],    0    ],
            [W[di,2], W[di,1]]]               [   0   , W[di,2]]]

(block rows = input parity, block cols = output parity; W[di, dj] is the
[64, 64] tap for kernel offset (di-1, dj-1)). Useful-FLOP fraction:
6 of 8 quadrant-passes = 75%, vs 50% for the block-diagonal form — the
structural limit for 3-wide kernels under pair packing (wider pixel groups
and 2x2 quad packing both analyze worse; see SOL.md).

The same structure serves the backward pass:
  dx = conv3x3_wp(dy, W') with W'[di, dj] = W[2-di, 2-dj]^T (same kernel),
  dw via the SAME (center, ae) operands contracted against dy over the
  batch-spatial dim (conv3x3_wp_dw) — quadrants of the [128, 128] results
  assemble the 9 taps exactly (two partial sums per tap, one per parity
  alignment).

An optional fused epilogue accumulates per-lane sum / sum-of-squares of the
f32 accumulator — the BatchNorm batch statistics — so train mode saves the
separate stats read pass over the 512^2 conv output.

Parity contract: exact (up to f32 reassociation of the 9-tap sum) with
lax.conv_general_dilated on the unpacked layout; tested in
tests/test_pallas_conv.py with interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64          # per-branch channels at the packed levels
L = 2 * C       # packed lane count

# Row-block size used by the differentiable wrappers. 16 fits Mosaic's
# default scoped-VMEM budget; larger blocks amortize the per-block fixed
# cost (~12 us vs ~3.3 us of matmul) and are enabled by the raised
# vmem_limit_bytes in _cparams — measured on-chip: rblk 16/32/64 chain
# 6.70/6.43/6.30 ms vs XLA block-diagonal 5.31 ms (RESULTS.md round 3),
# so bigger blocks help the kernel ~6% but do not flip the A/B.
import os as _os

# Largest measured-safe row block: rblk=64 needs ~43 MB scoped VMEM (fits
# the raised 100 MB cap in _cparams); 128 would exceed it at the 512^2
# sites. Values above are rejected rather than silently clamped.
_RBLK_MAX = 64
_RBLK_CACHE: list = []


def _rblk() -> int:
    """Row-block size for the differentiable wrappers, from ONET_WP_RBLK.

    Parsed lazily (first kernel call, not import) so a malformed value
    can't break `import onet_tpu.*` for CLI paths that never touch the
    Pallas kernels (advisor round-3 finding)."""
    if _RBLK_CACHE:
        return _RBLK_CACHE[0]
    raw = _os.environ.get("ONET_WP_RBLK", "16")
    try:
        rblk = int(raw)
    except ValueError:
        raise ValueError(
            f"ONET_WP_RBLK={raw!r}: not an integer (expected a positive "
            f"power of two <= {_RBLK_MAX})") from None
    if rblk < 1 or rblk & (rblk - 1) or rblk > _RBLK_MAX:
        raise ValueError(
            f"ONET_WP_RBLK={rblk}: must be a positive power of two "
            f"<= {_RBLK_MAX} (row-block sizes halve until they divide H; "
            f"blocks above {_RBLK_MAX} exceed the scoped-VMEM cap)")
    _RBLK_CACHE.append(rblk)
    return rblk


# ---------------------------------------------------------------------------
# layout helpers (XLA)
# ---------------------------------------------------------------------------

def pack_wp(x_stacked: jnp.ndarray) -> jnp.ndarray:
    """Channel-stacked [B, H, W, 2C] -> width-pair-packed [2B, H, W/2, 2C].

    Branch b of the channel stack (lanes [b*C, (b+1)*C)) lands at batch
    slot b*B + n; lanes become (w%2)*C + c. One relayout copy in XLA.
    """
    b, h, w, c2 = x_stacked.shape
    c = c2 // 2
    xb = jnp.concatenate([x_stacked[..., :c], x_stacked[..., c:]], axis=0)
    return xb.reshape(2 * b, h, w // 2, 2 * c)


def unpack_wp(x_wp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_wp."""
    n2, h, wp, l = x_wp.shape
    b = n2 // 2
    c = l // 2
    xb = x_wp.reshape(n2, h, wp * 2, c)
    return jnp.concatenate([xb[:b], xb[b:]], axis=-1)


def make_wc_we(w: jnp.ndarray, dtype=jnp.bfloat16):
    """Pack a [3, 3, 64, 64] HWIO weight into (Wc [3, 128, 128],
    We [3, 128, 128]) for the pair-packed kernel."""
    assert w.shape == (3, 3, C, C), w.shape
    w = w.astype(dtype)
    z = jnp.zeros((C, C), dtype)
    wc = jnp.stack([
        jnp.block([[w[di, 1], w[di, 0]], [w[di, 2], w[di, 1]]])
        for di in range(3)])
    we = jnp.stack([
        jnp.block([[w[di, 0], z], [z, w[di, 2]]])
        for di in range(3)])
    return wc, we


def flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """W'[di, dj] = W[2-di, 2-dj]^T — the weight transform under which
    conv3x3_wp computes the input cotangent of conv3x3_wp(x, W)."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fill_row_window(x_any, xb_ref, xs, sem, n, hb, r0, rblk, hblk):
    """Assemble the [rblk+2]-row window in scratch ``xs``: the bulk rows
    come from the auto-pipelined VMEM block ``xb_ref`` (Mosaic overlaps its
    HBM fetch across grid steps); only the TWO halo rows are fetched
    manually from ``x_any`` (or zeroed at image bounds). The manual DMAs
    start first, the bulk VMEM copy proceeds under them, then both waits."""
    top = hb > 0
    bot = hb < hblk - 1
    zero_row = jnp.zeros(xs.shape[1:], xs.dtype)
    if hblk > 1:
        @pl.when(top)
        def _():
            pltpu.make_async_copy(x_any.at[n, pl.ds(r0 - 1, 1)],
                                  xs.at[pl.ds(0, 1)], sem.at[0]).start()

        @pl.when(bot)
        def _():
            pltpu.make_async_copy(x_any.at[n, pl.ds(r0 + rblk, 1)],
                                  xs.at[pl.ds(rblk + 1, 1)],
                                  sem.at[1]).start()

    xs[1:rblk + 1] = xb_ref[0]

    if hblk > 1:
        @pl.when(jnp.logical_not(top))
        def _():
            xs[0] = zero_row

        @pl.when(jnp.logical_not(bot))
        def _():
            xs[rblk + 1] = zero_row

        @pl.when(top)
        def _():
            pltpu.make_async_copy(x_any.at[n, pl.ds(r0 - 1, 1)],
                                  xs.at[pl.ds(0, 1)], sem.at[0]).wait()

        @pl.when(bot)
        def _():
            pltpu.make_async_copy(x_any.at[n, pl.ds(r0 + rblk, 1)],
                                  xs.at[pl.ds(rblk + 1, 1)],
                                  sem.at[1]).wait()
    else:
        xs[0] = zero_row
        xs[rblk + 1] = zero_row


# perf-probe knob (bench only — wrong numerics except ""): "noae" skips the
# edge-operand construction AND edge matmuls; "noedge" keeps ae but skips
# the edge matmuls; "nodma" additionally... (see runs/pallas_conv_bench.py)
_PROBE = ""


def _build_ae(xs, ae, wp, rblk):
    """ae[:, j] = [x[:, j-1, C:] | x[:, j+1, :C]] (cross-pair operand)."""
    ae[:, 1:, :C] = xs[:, : wp - 1, C:]
    ae[:, 0, :C] = jnp.zeros((rblk + 2, C), xs.dtype)
    ae[:, : wp - 1, C:] = xs[:, 1:, :C]
    ae[:, wp - 1, C:] = jnp.zeros((rblk + 2, C), xs.dtype)


def _fwd_kernel(x_any, xb_ref, wc_ref, we_ref, b_ref, y_ref, s1_ref,
                s2_ref, xs, ae, sem, *, rblk, hblk, wp, stats, bias_relu):
    """One grid step: output rows [hb*rblk, (hb+1)*rblk) of sample n.

    xs: VMEM scratch [rblk+2, wp, L] — the row window incl. halo.
    ae: VMEM scratch [rblk+2, wp, L] — the cross-pair (edge) operand.
    """
    n = pl.program_id(0)
    hb = pl.program_id(1)
    r0 = hb * rblk

    _fill_row_window(x_any, xb_ref, xs, sem, n, hb, r0, rblk, hblk)

    if _PROBE != "noae":
        _build_ae(xs, ae, wp, rblk)

    # --- 6 dense matmuls ---------------------------------------------------
    m = rblk * wp
    acc = jnp.zeros((m, L), jnp.float32)
    for di in range(3):
        xc = xs[di:di + rblk].reshape(m, L)
        acc += jnp.dot(xc, wc_ref[di], preferred_element_type=jnp.float32)
        if _PROBE not in ("noae", "noedge"):
            xe = ae[di:di + rblk].reshape(m, L)
            acc += jnp.dot(xe, we_ref[di],
                           preferred_element_type=jnp.float32)

    if bias_relu:
        # serving epilogue: bias add + ReLU fused into the conv store
        acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    y_ref[0] = acc.reshape(rblk, wp, L).astype(y_ref.dtype)

    if stats:
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


def _fwd2_kernel(xa_any, xa_ref, xb_any, xb_ref, wca_ref, wea_ref,
                 wcb_ref, web_ref, b_ref, y_ref, s1_ref, s2_ref,
                 xs, ae, sem, *, rblk, hblk, wp, stats, bias_relu):
    """Two-input variant: y = conv(xa, wa) + conv(xb, wb) — the decoder's
    concat(skip, up) conv WITHOUT materializing the concat (the two
    128-lane packed operands each contribute 6 matmuls). xs/ae scratch is
    shared serially between the inputs."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    r0 = hb * rblk
    m = rblk * wp
    acc = jnp.zeros((m, L), jnp.float32)

    for x_any, x_ref, wc_ref, we_ref in (
            (xa_any, xa_ref, wca_ref, wea_ref),
            (xb_any, xb_ref, wcb_ref, web_ref)):
        _fill_row_window(x_any, x_ref, xs, sem, n, hb, r0, rblk, hblk)
        _build_ae(xs, ae, wp, rblk)
        for di in range(3):
            xc = xs[di:di + rblk].reshape(m, L)
            xe = ae[di:di + rblk].reshape(m, L)
            acc += jnp.dot(xc, wc_ref[di],
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(xe, we_ref[di],
                           preferred_element_type=jnp.float32)

    if bias_relu:
        acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    y_ref[0] = acc.reshape(rblk, wp, L).astype(y_ref.dtype)

    if stats:
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


def _out_plumbing(n, h, wp, rblk, hblk, out_dtype):
    out_shape = [
        jax.ShapeDtypeStruct((n, h, wp, L), out_dtype),
        jax.ShapeDtypeStruct((n, 1, L), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, L), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, rblk, wp, L), lambda n, hb: (n, hb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, L), lambda n, hb: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, L), lambda n, hb: (n, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return out_shape, out_specs


def _pick_rblk(h, rblk):
    while h % rblk:
        rblk //= 2
    assert rblk >= 1, h
    return rblk


def _cparams(rblk):
    """Mosaic compiler params. Row blocks beyond 16 exceed Mosaic's default
    ~16 MB scoped-VMEM budget (rblk=32 stages ~21.5 MB of window/operand
    scratch); the v5e has 128 MB of physical VMEM, so raise the per-kernel
    cap instead of capping the block size. rblk<=16 keeps the default
    budget — the measured round-3 configuration is untouched."""
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=(100 * 1024 * 1024 if rblk > 16 else None))


def conv3x3_wp_raw(x, wc, we, *, bias=None, rblk: int = 16,
                   stats: bool = False, bias_relu: bool = False,
                   out_dtype=None, interpret: bool = False):
    """Pair-packed SAME 3x3 conv.

    x: [N, H, Wp, 128] (packed); wc/we: [3, 128, 128] from make_wc_we.
    Returns y [N, H, Wp, 128] (out_dtype, default x.dtype); with
    ``stats=True`` also per-sample lane sums (s1, s2) each [N, 128] f32
    (sum and sum-of-squares of the f32 conv output over that sample's
    pixels — reduce over batch slices for BatchNorm batch statistics).
    ``bias_relu=True`` fuses max(acc + bias, 0) into the store (serving
    epilogue); ``bias`` is a [128] packed vector.
    """
    n, h, wp, l = x.shape
    assert l == L, x.shape
    rblk = _pick_rblk(h, rblk)
    hblk = h // rblk
    out_dtype = out_dtype or x.dtype
    if bias is None:
        bias = jnp.zeros((L,), jnp.float32)
    bias = bias.reshape(1, L).astype(jnp.float32)

    kern = functools.partial(_fwd_kernel, rblk=rblk, hblk=hblk, wp=wp,
                             stats=stats, bias_relu=bias_relu)
    out_shape, out_specs = _out_plumbing(n, h, wp, rblk, hblk, out_dtype)
    y, s1, s2 = pl.pallas_call(
        kern,
        grid=(n, hblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # halo-row fetches
            pl.BlockSpec((1, rblk, wp, L),           # bulk rows, pipelined
                         lambda n, hb: (n, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rblk + 2, wp, L), x.dtype),
            pltpu.VMEM((rblk + 2, wp, L), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_cparams(rblk),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wp * L * L * 6,
            bytes_accessed=int(x.size * x.dtype.itemsize * (1 + 2 / rblk)
                               + n * h * wp * L
                               * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x, x, wc, we, bias)
    if stats:
        return y, s1[:, 0, :], s2[:, 0, :]
    return y


def conv3x3_wp2_raw(xa, xb, wca, wea, wcb, web, *, bias=None,
                    rblk: int = 16, stats: bool = False,
                    bias_relu: bool = False, out_dtype=None,
                    interpret: bool = False):
    """Two-input pair-packed conv: y = conv(xa, wa) + conv(xb, wb) [+ bias,
    relu] — the decoder's concat(skip, up) conv with NO concat
    materialization. Same output contract as conv3x3_wp_raw."""
    n, h, wp, l = xa.shape
    assert l == L and xb.shape == xa.shape, (xa.shape, xb.shape)
    rblk = _pick_rblk(h, rblk)
    hblk = h // rblk
    out_dtype = out_dtype or xa.dtype
    if bias is None:
        bias = jnp.zeros((L,), jnp.float32)
    bias = bias.reshape(1, L).astype(jnp.float32)

    kern = functools.partial(_fwd2_kernel, rblk=rblk, hblk=hblk, wp=wp,
                             stats=stats, bias_relu=bias_relu)
    out_shape, out_specs = _out_plumbing(n, h, wp, rblk, hblk, out_dtype)
    blocked = pl.BlockSpec((1, rblk, wp, L),
                           lambda n, hb: (n, hb, 0, 0),
                           memory_space=pltpu.VMEM)
    y, s1, s2 = pl.pallas_call(
        kern,
        grid=(n, hblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY), blocked,
            pl.BlockSpec(memory_space=pl.ANY), blocked,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rblk + 2, wp, L), xa.dtype),
            pltpu.VMEM((rblk + 2, wp, L), xa.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_cparams(rblk),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wp * L * L * 12,
            bytes_accessed=int(2 * xa.size * xa.dtype.itemsize
                               * (1 + 2 / rblk)
                               + n * h * wp * L
                               * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xa, xa, xb, xb, wca, wea, wcb, web, bias)
    if stats:
        return y, s1[:, 0, :], s2[:, 0, :]
    return y


# ---------------------------------------------------------------------------
# weight-gradient kernel
# ---------------------------------------------------------------------------

def _dw_kernel(x_any, xb_ref, dy_ref, gc_ref, ge_ref, xs, ae, sem,
               *, rblk, hblk, wp):
    """Accumulate Gc[di] += xc^T dy, Ge[di] += ae^T dy over all blocks."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    r0 = hb * rblk

    _fill_row_window(x_any, xb_ref, xs, sem, n, hb, r0, rblk, hblk)

    ae[:, 1:, :C] = xs[:, : wp - 1, C:]
    ae[:, 0, :C] = jnp.zeros((rblk + 2, C), xs.dtype)
    ae[:, : wp - 1, C:] = xs[:, 1:, :C]
    ae[:, wp - 1, C:] = jnp.zeros((rblk + 2, C), xs.dtype)

    m = rblk * wp
    dy = dy_ref[0].reshape(m, L)
    dims = (((0,), (0,)), ((), ()))

    @pl.when(jnp.logical_and(n == 0, hb == 0))
    def _():
        gc_ref[...] = jnp.zeros_like(gc_ref)
        ge_ref[...] = jnp.zeros_like(ge_ref)

    for di in range(3):
        xc = xs[di:di + rblk].reshape(m, L)
        xe = ae[di:di + rblk].reshape(m, L)
        gc_ref[di] += lax.dot_general(xc, dy, dims,
                                      preferred_element_type=jnp.float32)
        ge_ref[di] += lax.dot_general(xe, dy, dims,
                                      preferred_element_type=jnp.float32)


def conv3x3_wp_dw(x, dy, *, rblk: int = 16, interpret: bool = False):
    """Weight gradient of the pair-packed conv: returns dw [3, 3, 64, 64]
    f32 (summed over the batch axis — weight sharing across branches is
    automatic because branches ride the batch)."""
    n, h, wp, l = x.shape
    assert l == L and dy.shape == x.shape, (x.shape, dy.shape)
    while h % rblk:
        rblk //= 2
    hblk = h // rblk

    kern = functools.partial(_dw_kernel, rblk=rblk, hblk=hblk, wp=wp)
    gc, ge = pl.pallas_call(
        kern,
        grid=(n, hblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # halo-row fetches
            pl.BlockSpec((1, rblk, wp, L),           # bulk rows, pipelined
                         lambda n, hb: (n, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, wp, L),
                         lambda n, hb: (n, hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, L, L), jnp.float32),
            jax.ShapeDtypeStruct((3, L, L), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((3, L, L), lambda n, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, L), lambda n, hb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rblk + 2, wp, L), x.dtype),
            pltpu.VMEM((rblk + 2, wp, L), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_cparams(rblk),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wp * L * L * 6,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, x, dy)

    # assemble the 9 taps from the quadrants (two partial sums per tap)
    dw = jnp.stack([
        jnp.stack([
            gc[di, 0:C, C:L] + ge[di, 0:C, 0:C],          # dj = -1
            gc[di, 0:C, 0:C] + gc[di, C:L, C:L],          # dj = 0
            gc[di, C:L, 0:C] + ge[di, C:L, C:L],          # dj = +1
        ]) for di in range(3)])
    return dw


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------

INTERPRET = False  # set True in CPU tests


@jax.custom_vjp
def conv3x3_wp(x, w):
    """Differentiable pair-packed 3x3 SAME conv with fused BN-stats.

    x: packed [N, H, Wp, 128] (any float dtype; matmuls run in x.dtype with
    f32 accumulation); w: [3, 3, 64, 64] HWIO per-branch weight.
    Returns (y, s1, s2): y in x.dtype, s1/s2 the per-sample f32 lane sums
    of y (sum, sum of squares). The stats outputs carry ZERO cotangent by
    construction (they feed the BatchNorm EMA / precomputed-stats apply,
    both of which stop gradients); the VJP ignores them.
    """
    wc, we = make_wc_we(w, dtype=x.dtype)
    return conv3x3_wp_raw(x, wc, we, stats=True, rblk=_rblk(),
                          interpret=INTERPRET)


def _conv_wp_fwd(x, w):
    out = conv3x3_wp(x, w)
    return out, (x, w)


def _conv_wp_bwd(res, cts):
    x, w = res
    dy, _ds1, _ds2 = cts
    dy = dy.astype(x.dtype)
    wtc, wte = make_wc_we(flip_transpose(w), dtype=x.dtype)
    dx = conv3x3_wp_raw(dy, wtc, wte, stats=False, rblk=_rblk(),
                        interpret=INTERPRET)
    dw = conv3x3_wp_dw(x, dy, rblk=_rblk(),
                       interpret=INTERPRET).astype(w.dtype)
    return dx, dw


conv3x3_wp.defvjp(_conv_wp_fwd, _conv_wp_bwd)


@jax.custom_vjp
def conv3x3_wp2(xa, xb, wa, wb):
    """Differentiable two-input pair-packed conv with fused BN-stats:
    y = conv(xa, wa) + conv(xb, wb) — the decoder conv over concat(skip,
    up) with the concat never materialized. wa/wb: [3, 3, 64, 64] HWIO
    (the [3, 3, 128, 64] concat weight split at row 64). Returns
    (y, s1, s2) like conv3x3_wp."""
    dt = xa.dtype
    wca, wea = make_wc_we(wa, dtype=dt)
    wcb, web = make_wc_we(wb, dtype=dt)
    return conv3x3_wp2_raw(xa, xb, wca, wea, wcb, web, stats=True,
                           rblk=_rblk(), interpret=INTERPRET)


def _conv_wp2_fwd(xa, xb, wa, wb):
    return conv3x3_wp2(xa, xb, wa, wb), (xa, xb, wa, wb)


def _conv_wp2_bwd(res, cts):
    xa, xb, wa, wb = res
    dy, _ds1, _ds2 = cts
    dy = dy.astype(xa.dtype)
    wtca, wtea = make_wc_we(flip_transpose(wa), dtype=dy.dtype)
    wtcb, wteb = make_wc_we(flip_transpose(wb), dtype=dy.dtype)
    dxa = conv3x3_wp_raw(dy, wtca, wtea, stats=False, rblk=_rblk(),
                         interpret=INTERPRET)
    dxb = conv3x3_wp_raw(dy, wtcb, wteb, stats=False, rblk=_rblk(),
                         interpret=INTERPRET)
    dwa = conv3x3_wp_dw(xa, dy, rblk=_rblk(),
                        interpret=INTERPRET).astype(wa.dtype)
    dwb = conv3x3_wp_dw(xb, dy, rblk=_rblk(),
                        interpret=INTERPRET).astype(wb.dtype)
    return dxa, dxb, dwa, dwb


conv3x3_wp2.defvjp(_conv_wp2_fwd, _conv_wp2_bwd)
