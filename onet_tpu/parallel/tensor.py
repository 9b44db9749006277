"""EXACT channel tensor-parallelism (Megatron-style) via shard_map.

The third parallelism axis after data (core/mesh.py) and space
(parallel/halo.py): the CHANNEL dimension of every DoubleConv is sharded
over a ``model`` mesh axis. For a conv U-Net this is the natural tensor
parallelism — there is no attention to head-split, but the channel
algebra is identical to Megatron's MLP split:

* **conv1 is column-parallel**: each device holds a slice of the OUTPUT
  channels of ``w1`` and computes its channel block of the full conv.
* **BatchNorm is channel-local**: BN statistics are per-channel, so a
  channel-sharded tensor normalizes with zero model-axis communication
  (the one collective BN needs is the ``psum`` over the *data* axis that
  full-batch parity already requires — parallel/halo.py's BN, reused).
* **conv2 / conv-transpose are row-parallel**: each device consumes its
  INPUT-channel slice and produces a partial sum of the full output,
  combined with ``lax.psum_scatter`` so the result lands channel-sharded
  again — one fused reduce+scatter per block instead of an all-reduce.
* **maxpool / ReLU / pad are channel-local.**
* **the projection head** reduces over channels, so each device
  contributes a partial per-pixel dot product; one ``psum`` over
  ``model`` yields the exact [B, H, W] projection logits.

Between blocks activations travel channel-sharded ([..., C/T] per
device); the next block's column-parallel conv1 needs full input
channels, so each block boundary is one ``all_gather`` over ``model``.
Per DoubleConv the model-axis traffic is one all-gather + one
psum_scatter of an activation — the activation *memory* per device drops
by ~T, which is the point: tiles too large for one chip's HBM train
without approximation (the spatial path is the other exact option; this
one needs no halo geometry constraints on H).

No redundant param-consuming compute exists anywhere on the model axis
(every weight use is a distinct slice), so the transpose of the
replicated-in params (a mesh-wide psum of per-device gradient
contributions) assembles the exact full gradient — the same argument
parallel/halo.py validates numerically, extended to channel slices
(tests/test_tensor_parallel.py asserts loss, gradients, BN state, and
post-Adam params match the single-device step).

Params stay replicated: at 31 M parameters (BASELINE.md) sharding them
would save ~60 MB/device while complicating the optimizer and
checkpoint paths for nothing; the memory that matters (activations)
is sharded.

Reference: N/A — the reference is single-device
(SURVEY §2.10: no distributed code anywhere); this is part of the
additive TPU-native parallelism mandate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from onet_tpu.core.mesh import DATA_AXIS, NamedSharding, replicated
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L
from onet_tpu.models.onet import _jsd_loss_pair, is_weight_shared
from onet_tpu.ops.normalize import complement
from onet_tpu.parallel.halo import make_halo_ops
from onet_tpu.train.optim import adam_update

MODEL_AXIS = "model"


def _slice_ch(w, dim: int, t: int):
    """This device's channel block of ``w`` along ``dim`` (T slices)."""
    assert w.shape[dim] % t == 0, (w.shape, dim, t)
    k = w.shape[dim] // t
    m = lax.axis_index(MODEL_AXIS)
    return lax.dynamic_slice_in_dim(w, m * k, k, dim)


def _slice_vec_tree(d, t: int):
    """Slice every [C] leaf of a BN params/state dict to this device's
    channel block."""
    return {k: _slice_ch(v, 0, t) for k, v in d.items()}


def _gather_vec_tree(d):
    """Reassemble full-channel BN state from per-device slices."""
    return {k: lax.all_gather(v, MODEL_AXIS, axis=0, tiled=True)
            for k, v in d.items()}


def _gather_ch(x):
    """Channel-sharded activation [..., C/T] -> full [..., C]."""
    return lax.all_gather(x, MODEL_AXIS, axis=x.ndim - 1, tiled=True)


def _dconv_tp(p, s, x_full, *, t, bn, train, policy):
    """One DoubleConv, column-parallel conv1 -> row-parallel conv2.

    ``x_full``: full-channel input (replicated over ``model``). Returns
    (y_sharded [..., Cout/T], new_bn_state with FULL-channel leaves).
    """
    h = L.conv3x3(x_full, _slice_ch(p["conv1"]["w"], 3, t), policy=policy)
    h, s1 = bn(h, _slice_vec_tree(p["bn1"], t), _slice_vec_tree(s["bn1"], t),
               train=train, groups=2)
    h = L.relu(h)
    part = L.conv3x3(h, _slice_ch(p["conv2"]["w"], 2, t), policy=policy)
    y = lax.psum_scatter(part, MODEL_AXIS, scatter_dimension=3, tiled=True)
    y, s2 = bn(y, _slice_vec_tree(p["bn2"], t), _slice_vec_tree(s["bn2"], t),
               train=train, groups=2)
    y = L.relu(y)
    return y, {"bn1": _gather_vec_tree(s1), "bn2": _gather_vec_tree(s2)}


def _up_tp(p, s, x_sh, skip_sh, *, t, bn, train, policy):
    """Up block: row-parallel conv-transpose + pad + gather-concat +
    DoubleConv. ``x_sh``/``skip_sh`` are channel-sharded."""
    w = p["up"]["w"]                                  # [2, 2, Cin, Cin//2]
    part = L._conv_transpose_core(policy.cast_compute(x_sh),
                                  policy.cast_compute(_slice_ch(w, 2, t)),
                                  policy.precision)
    u = lax.psum_scatter(part, MODEL_AXIS, scatter_dimension=3, tiled=True)
    u = u + _slice_ch(p["up"]["b"], 0, t).astype(u.dtype)
    dh = skip_sh.shape[1] - u.shape[1]
    dw = skip_sh.shape[2] - u.shape[2]
    if dh or dw:
        u = jnp.pad(u, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
    # gather skip and up separately: concat-of-slices would interleave the
    # channel blocks, breaking the [skip | up] weight layout of conv1
    xin = jnp.concatenate([_gather_ch(skip_sh), _gather_ch(u)], axis=-1)
    y, ns = _dconv_tp(p["conv"], s["conv"], xin, t=t, bn=bn, train=train,
                      policy=policy)
    return y, {"conv": ns}


def unet_apply_tp(params, state, x2b, *, t, bn, train: bool,
                  policy: Policy = DEFAULT):
    """The 4-down/4-up U-Net (models/unet.py::unet_apply) with every
    DoubleConv channel-sharded over ``model``.

    ``x2b``: the batch-stacked complementary pair [2B_local, H, W, Cin]
    (full channels). Returns ((local, glob) both [..., 64/T] sharded,
    new_state full-channel).
    """
    ns = {}
    x1, ns["inc"] = _dconv_tp(params["inc"], state["inc"], x2b, t=t, bn=bn,
                              train=train, policy=policy)
    feats = [x1]
    h = x1
    for i in range(1, 5):
        # pool on the shard (4x fewer bytes), then one gather per block
        pooled = L.max_pool_2x2(h)
        h, ns[f"down{i}"] = _dconv_tp(params[f"down{i}"], state[f"down{i}"],
                                      _gather_ch(pooled), t=t, bn=bn,
                                      train=train, policy=policy)
        feats.append(h)
    y = feats[4]
    for i in range(1, 5):
        y, ns[f"up{i}"] = _up_tp(params[f"up{i}"], state[f"up{i}"], y,
                                 feats[4 - i], t=t, bn=bn, train=train,
                                 policy=policy)
    return (x1, y), ns


def make_tp_train_step(mesh, *, policy: Policy = DEFAULT, bias: float = 0.0):
    """Jitted train step with batch sharded over ``data`` and conv channels
    sharded over ``model``. Signature matches train.steps.make_train_step;
    params/BN/optimizer trees stay replicated. Weight-shared models only
    (the twin form would just run this twice)."""
    t = int(mesh.shape[MODEL_AXIS])
    # full-batch BN statistics: per-channel sums psum'd over data only —
    # the channel axis needs no BN collective at all
    bn = make_halo_ops(1, bn_axes=(DATA_AXIS,)).batch_norm
    xspec = P(DATA_AXIS, None, None, None)

    def sharded_loss(p, bnst, x_loc):
        assert is_weight_shared(p), "tensor parallelism: weight-shared only"
        x2b = jnp.concatenate([x_loc, complement(x_loc, bias)], axis=0)
        (loc, glob), new_top = unet_apply_tp(p["top"], bnst["top"], x2b,
                                             t=t, bn=bn, train=True,
                                             policy=policy)
        locf = loc.astype(jnp.float32)
        v = lax.psum(jnp.sum(locf * glob.astype(jnp.float32), axis=-1),
                     MODEL_AXIS)                       # [2B, H, W]
        lsum = lax.psum(jnp.sum(locf, axis=-1), MODEL_AXIS)
        b = x_loc.shape[0]
        vpair = jnp.stack([v[:b], v[b:]], axis=-1)
        lpair = jnp.stack([lsum[:b], lsum[b:]], axis=-1)
        loss = _jsd_loss_pair(lpair, jax.nn.softmax(vpair, axis=-1))
        return lax.pmean(loss, DATA_AXIS), {"top": new_top}

    # check_vma=False for the same reason as parallel/halo.py:155-161 —
    # the custom-VJP layers hide the replication structure from the static
    # checker; exactness is asserted numerically in
    # tests/test_tensor_parallel.py.
    smapped = jax.shard_map(sharded_loss, mesh=mesh,
                            in_specs=(P(), P(), xspec),
                            out_specs=(P(), P()), check_vma=False)

    def train_step(params, bn_state, opt_state, x, lr):
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
