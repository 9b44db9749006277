"""EXACT spatially-partitioned training: shard_map + explicit halo exchange.

Round-1 finding (ROADMAP/VERDICT): GSPMD's automatically-partitioned
backward for spatially-sharded 3x3 convs and maxpool (select_and_scatter)
is approximate — gradients agree in direction at >=4-row shards and corrupt
at 1-row shards. The fix is to stop asking the partitioner to invert the
communication pattern and write it ourselves: under ``jax.shard_map`` every
operation is local and the collectives are explicit, so JAX's autodiff
transposes them exactly (ppermute -> reversed ppermute, psum -> broadcast).

Design:
* 3x3 SAME conv: each shard holds a contiguous block of image rows (and,
  on a 2-D ``(space, spacew)`` spatial mesh, a row x column block);
  exchange ONE boundary row with each spatial neighbor via ``lax.ppermute``
  (edge shards receive zeros == the SAME zero padding), then convolve with
  VALID height / SAME width. Exact for any shard height >= 1. In 2-D the
  column exchange runs on the ROW-PADDED tensor, so the sent columns carry
  the row halos and the diagonal-neighbor corner pixels arrive in two hops
  — no explicit corner communication needed.
* 2x2 stride-2 maxpool / transposed conv: window-aligned, purely local
  (requires even local heights: H divisible by 16 * n_space for the 4-level
  U-Net).
* BatchNorm: per-branch statistics are sums over (batch, H, W) — reduced
  with ``lax.psum`` over the ``space`` axis (and ``data``: the reference is
  single-device, so exact parity means FULL-batch statistics, which is also
  what the GSPMD data-parallel path computes).
* Loss: local mean -> ``lax.pmean`` over the whole mesh (equal shard
  sizes).
* Parameter gradients: params enter the shard_map replicated; the
  transpose of that broadcast is a psum over the mesh — the gradient
  all-reduce falls out of autodiff.

Reference: N/A (the reference is single-device; SURVEY §2.10 mandates the
mesh design). Validated exact vs the single-device step at 1-row deep
shards in tests/test_spatial_halo.py.
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from onet_tpu.core.mesh import (DATA_AXIS, SPACE_AXIS, SPACEW_AXIS,
                                replicated, NamedSharding)
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L
from onet_tpu.models.layers import BN_EPS, BN_MOMENTUM
from onet_tpu.models.onet import onet_forward, compute_loss
from onet_tpu.train.optim import adam_update


def _exchange_row_halos(x, space_axis: str, n_space: int):
    """Returns x padded with one neighbor row above and below. Global edge
    shards receive zero rows (== SAME conv zero padding)."""
    if n_space == 1:
        zero = jnp.zeros_like(x[:, :1])
        return jnp.concatenate([zero, x, zero], axis=1)
    down = [(i, i + 1) for i in range(n_space - 1)]   # shard i -> shard i+1
    up = [(i + 1, i) for i in range(n_space - 1)]     # shard i+1 -> shard i
    top = lax.ppermute(x[:, -1:], space_axis, down)   # last row of i-1
    bot = lax.ppermute(x[:, :1], space_axis, up)      # first row of i+1
    return jnp.concatenate([top, x, bot], axis=1)


def _exchange_col_halos(x, spacew_axis: str, n_spacew: int):
    """Column analogue of _exchange_row_halos (pads axis 2 by one column
    from each width-neighbor; global edge shards receive zeros)."""
    if n_spacew == 1:
        zero = jnp.zeros_like(x[:, :, :1])
        return jnp.concatenate([zero, x, zero], axis=2)
    right = [(i, i + 1) for i in range(n_spacew - 1)]
    left = [(i + 1, i) for i in range(n_spacew - 1)]
    lcol = lax.ppermute(x[:, :, -1:], spacew_axis, right)
    rcol = lax.ppermute(x[:, :, :1], spacew_axis, left)
    return jnp.concatenate([lcol, x, rcol], axis=2)


def make_halo_ops(n_space: int, n_spacew: int = 1, *,
                  space_axis: str = SPACE_AXIS,
                  spacew_axis: str = SPACEW_AXIS, bn_axes=None):
    """Layer-op namespace for unet_apply/onet_forward under shard_map.

    ``n_spacew > 1`` enables 2-D spatial partitioning: image width shards
    over ``spacew_axis`` in addition to height over ``space_axis``. The
    column exchange runs on the row-padded tensor, so corner pixels reach
    diagonal neighbors through the two axis-aligned hops.
    """
    if bn_axes is None:
        bn_axes = ((DATA_AXIS, space_axis, spacew_axis) if n_spacew > 1
                   else (DATA_AXIS, space_axis))

    def conv3x3(x, w, *, policy: Policy = DEFAULT):
        xp = _exchange_row_halos(x, space_axis, n_space)
        if n_spacew > 1:
            xp = _exchange_col_halos(xp, spacew_axis, n_spacew)
            pad_w = (0, 0)                   # W covered by halos too
        else:
            pad_w = (1, 1)                   # W SAME
        return lax.conv_general_dilated(
            policy.cast_compute(xp), policy.cast_compute(w),
            window_strides=(1, 1),
            padding=((0, 0), pad_w),         # H covered by halos
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=policy.precision)

    def batch_norm(x, params, state, *, train: bool, groups: int = 1,
                   momentum: float = BN_MOMENTUM, eps: float = BN_EPS,
                   stacked: bool = False, interleaved: bool = False):
        if not train:
            return L.batch_norm(x, params, state, train=False, groups=groups,
                                momentum=momentum, eps=eps, stacked=stacked,
                                interleaved=interleaved)
        c = len(params["scale"])
        xf = x.astype(jnp.float32)
        n, h, w, _ = x.shape
        if stacked:
            s1 = jnp.sum(xf, axis=(0, 1, 2)).reshape(groups, c)
            s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2)).reshape(groups, c)
            cnt_loc = n * h * w
        else:
            # block or sample-interleaved branch layout (layers._group_view
            # semantics: group index = branch either way)
            view, red, bcast = L._group_view(groups, interleaved)
            xg = view(xf, n, h, w, c, groups)
            s1 = jnp.sum(xg, axis=red)                             # [G, C]
            s2 = jnp.sum(jnp.square(xg), axis=red)
            cnt_loc = (n // groups) * h * w
        s1 = lax.psum(s1, bn_axes)
        s2 = lax.psum(s2, bn_axes)
        cnt = lax.psum(jnp.float32(cnt_loc), bn_axes)
        mean = s1 / cnt                                            # [G, C]
        var = s2 / cnt - jnp.square(mean)
        inv = lax.rsqrt(var + eps)
        sf = params["scale"].astype(jnp.float32)
        bf = params["bias"].astype(jnp.float32)
        if stacked:
            y = ((xf - mean.reshape(-1)) * (inv.reshape(-1)
                 * jnp.tile(sf, groups)) + jnp.tile(bf, groups))
        else:
            yg = ((xg - bcast(mean)) * bcast(inv * sf) + bf)
            y = yg.reshape(n, h, w, c)
        y = y.astype(x.dtype)
        unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
        r_mean, r_var = state["mean"], state["var"]
        for i in range(groups):
            r_mean = (1 - momentum) * r_mean + momentum * mean[i]
            r_var = (1 - momentum) * r_var + momentum * unbiased[i]
        new_state = {"mean": lax.stop_gradient(r_mean),
                     "var": lax.stop_gradient(r_var)}
        return y, new_state

    return types.SimpleNamespace(
        conv3x3=conv3x3,
        batch_norm=batch_norm,
        max_pool=L.max_pool_2x2,          # window-aligned: local
        conv_transpose=L.conv_transpose_2x2,  # stride==kernel: local
    )


def validate_spatial_shapes(h: int, n_space: int, levels: int = 4,
                            w: int = None, n_spacew: int = 1):
    """Every maxpool needs an even local extent: H % (2^levels * n_space)
    (and W % (2^levels * n_spacew) on a 2-D spatial mesh)."""
    if h % ((2 ** levels) * n_space):
        raise ValueError(
            f"height {h} not divisible by {(2 ** levels) * n_space} "
            f"(= 2^{levels} pool levels x {n_space} spatial shards)")
    if n_spacew > 1 and (w or h) % ((2 ** levels) * n_spacew):
        raise ValueError(
            f"width {w or h} not divisible by {(2 ** levels) * n_spacew} "
            f"(= 2^{levels} pool levels x {n_spacew} width shards)")


def make_spatial_train_step(mesh, *, policy: Policy = DEFAULT,
                            bias: float = 0.0, channel_stack: bool = False):
    """Jitted train step with the batch sharded over ``data`` AND image
    height sharded over ``space`` — gradients EXACT (halo-exchange convs,
    psum BN statistics), unlike the GSPMD ``spatial=True`` path whose conv
    backward is approximate. Signature matches train.steps.make_train_step.
    """
    n_space = int(mesh.shape[SPACE_AXIS])
    # a 'spacew' mesh axis additionally shards image WIDTH (2-D spatial
    # partitioning; halos exchange along both torus directions)
    n_spacew = int(mesh.shape.get(SPACEW_AXIS, 1))
    two_d = SPACEW_AXIS in mesh.axis_names and n_spacew > 1
    ops = make_halo_ops(n_space, n_spacew if two_d else 1)
    mesh_axes = ((DATA_AXIS, SPACE_AXIS, SPACEW_AXIS) if two_d
                 else (DATA_AXIS, SPACE_AXIS))
    xspec = (P(DATA_AXIS, SPACE_AXIS, SPACEW_AXIS, None) if two_d
             else P(DATA_AXIS, SPACE_AXIS, None, None))

    def sharded_loss(p, bnst, x_loc):
        out, new_bn = onet_forward(p, bnst, x_loc, train=True, bias=bias,
                                   policy=policy, channel_stack=channel_stack,
                                   ops=ops)
        loss = compute_loss(out)     # local mean; equal shard sizes
        return lax.pmean(loss, mesh_axes), new_bn

    # check_vma=False: the static replication checker cannot see through
    # the custom-VJP layers' transpose; correctness (psum'd param grads,
    # replicated loss/BN state) is asserted numerically in
    # tests/test_spatial_halo.py against the single-device step.
    smapped = jax.shard_map(sharded_loss, mesh=mesh,
                            in_specs=(P(), P(), xspec),
                            out_specs=(P(), P()), check_vma=False)

    def train_step(params, bn_state, opt_state, x, lr):
        validate_spatial_shapes(x.shape[1], n_space,
                                w=x.shape[2], n_spacew=n_spacew)
        (loss, new_bn), grads = jax.value_and_grad(
            lambda p: smapped(p, bn_state, x), has_aux=True)(params)
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss

    rep = replicated(mesh)
    xsh = NamedSharding(mesh, xspec)
    return jax.jit(train_step, donate_argnums=(0, 1, 2),
                   in_shardings=(rep, rep, rep, xsh, None),
                   out_shardings=(rep, rep, rep, None))
