"""EXACT pipeline parallelism: GPipe schedule over a ``stage`` mesh axis.

The fourth parallelism axis after data (core/mesh.py), space
(parallel/halo.py) and channel (parallel/tensor.py): the NETWORK DEPTH is
split over devices. The U-Net's natural 2-stage cut is encoder | decoder —
the encoder's five feature maps (the decoder's skip inputs) are exactly
the inter-stage payload, so nothing is recomputed and nothing extra is
shipped beyond what the architecture already requires crossing that cut.

Schedule: plain GPipe. The global batch is cut into M microbatches; over
``M + S - 1`` ticks (S = 2 stages) microbatch ``m`` runs the encoder on
the stage-0 device at tick ``m`` and the decoder + JSD head on the
stage-1 device at tick ``m + 1``. Each tick every device applies ITS
stage (``lax.cond`` on ``lax.axis_index('stage')``) and the payload moves
one stage down via ``lax.ppermute``; bubble ticks are masked. The whole
schedule is a ``lax.scan``, so jax reverse-mode AD derives the backward
pipeline automatically (the transposed scan runs the reversed schedule
with reversed ppermutes — the hand-scheduled backward pass of classical
pipeline frameworks falls out of the program transform).

Numerics contract — this is the part worth stating precisely. A pipeline
necessarily computes BatchNorm train-mode statistics PER MICROBATCH (the
full batch never coexists at one stage), which is also exactly what the
single-device gradient-accumulation step does (train/steps.py,
``microbatches=M``: per-microbatch statistics, running EMA threaded in
microbatch order, mean-of-microbatch gradients into ONE Adam update).
That step is therefore the exactness mate: pipeline(S=2, M) reproduces
its loss, gradients, BN state and parameter update to fp-reassociation
noise (tests/test_pipeline_parallel.py), and the grad-accumulation step
itself equals the full-batch step whenever microbatch statistics agree
(tests/test_microbatch.py).

Composition with data parallelism: mesh ``('data', 'stage')``. The batch
shards over ``data``; BN statistics psum over the data axis inside each
stage (full-microbatch statistics, the same collective the other exact
paths use), and the loss is the data-axis pmean — all data-axis peers sit
at the same stage, so the collectives run uniformly inside the cond.

Params stay replicated (same argument as parallel/tensor.py: 31 M params
are not the memory that matters); each device READS only its stage's
weights, so the replicated-in transpose psum assembles the exact full
gradient. What the pipeline buys is per-device ACTIVATION memory — each
device holds the live residuals of only its half of the depth — plus
depth-wise scale-out on meshes where batch or spatial sharding is
exhausted.

Reference: N/A — the reference is single-device (SURVEY §2.10); this is
part of the additive TPU-native parallelism mandate (dp/sp/tp/pp).
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from onet_tpu.core.mesh import DATA_AXIS, NamedSharding, replicated
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models import layers as L
from onet_tpu.models.onet import channel_dot, is_weight_shared, jsd
from onet_tpu.models.unet import _double_conv, _down, _up
from onet_tpu.ops.normalize import complement
from onet_tpu.parallel.halo import make_halo_ops
from onet_tpu.train.optim import adam_update

STAGE_AXIS = "stage"
N_STAGES = 2  # encoder | decoder — the U-Net's natural cut

_ENC_KEYS = ("inc", "down1", "down2", "down3", "down4")
_DEC_KEYS = ("up1", "up2", "up3", "up4")


def _stage_ops(bn):
    return types.SimpleNamespace(
        conv3x3=L.conv3x3, batch_norm=bn,
        max_pool=L.max_pool_2x2, conv_transpose=L.conv_transpose_2x2)


def _encode(p, s, x2b, *, ops, policy):
    """Stage 0: inc + down1..down4 on the batch-stacked pair. Returns the
    five skip/bottleneck feature maps (the inter-stage payload) and the
    encoder BN updates."""
    ns = {}
    h, ns["inc"] = _double_conv(p["inc"], s["inc"], x2b, train=True,
                                groups=2, policy=policy, ops=ops)
    feats = [h]
    for i in range(1, 5):
        h, ns[f"down{i}"] = _down(p[f"down{i}"], s[f"down{i}"], h,
                                  train=True, groups=2, policy=policy,
                                  ops=ops)
        feats.append(h)
    return tuple(feats), ns


def _decode_loss(p, s, feats, *, ops, policy):
    """Stage 1: up1..up4 + projection head + symmetric JSD loss (the
    channel_stack=False branch of models/onet.py::onet_forward followed by
    compute_loss's per-branch form, on the local data shard)."""
    ns = {}
    y = feats[4]
    for i in range(1, 5):
        y, ns[f"up{i}"] = _up(p[f"up{i}"], s[f"up{i}"], y, feats[4 - i],
                              train=True, groups=2, policy=policy, ops=ops)
    loc, glob = feats[0], y
    b = loc.shape[0] // 2
    lt, ld = loc[:b].astype(jnp.float32), loc[b:].astype(jnp.float32)
    vt = channel_dot(lt, glob[:b].astype(jnp.float32))
    vd = channel_dot(ld, glob[b:].astype(jnp.float32))
    sm = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    ct, cd = jnp.sum(lt, axis=-1), jnp.sum(ld, axis=-1)
    loss = -(jsd(ct, sm[..., 0], sm[..., 1])
             + jsd(cd, sm[..., 1], sm[..., 0])) / 2.0
    return loss, ns


def _payload_shapes(b2, h, w, base):
    """Zero inter-stage buffers: the encoder's five outputs."""
    if h % 16 or w % 16:
        raise ValueError(f"pipeline needs H, W divisible by 16, got {h}x{w}")
    c = tuple(base * m for m in (1, 2, 4, 8, 16))
    return tuple((b2, h >> k, w >> k, c[k]) for k in range(5))


def _mask_update(old, new, valid):
    """BN leaves advance only on valid (non-bubble) ticks."""
    return jax.tree.map(lambda o, n: jnp.where(valid, n, o), old, new)


def make_pp_loss_fn(mesh, *, microbatches: int, policy: Policy = DEFAULT,
                    bias: float = 0.0):
    """The shard-mapped pipelined loss:
    (params, bn_state, xm[M, B/M, H, W, C]) -> (loss, new_bn_state).
    Building block of make_pp_train_step; exposed for gradient tests."""
    if int(mesh.shape[STAGE_AXIS]) != N_STAGES:
        raise ValueError(f"pipeline mesh needs {N_STAGES} '{STAGE_AXIS}' "
                         f"devices, got {mesh.shape}")
    m_count = int(microbatches)
    if m_count < 1:
        raise ValueError("microbatches must be >= 1")
    # full-microbatch BN statistics under data sharding: psum over 'data'
    # only (all data-axis peers run the same stage, so the collective is
    # uniform inside the stage cond)
    ops = _stage_ops(make_halo_ops(1, bn_axes=(DATA_AXIS,)).batch_norm)
    # microbatch-major input: the step reshapes the global batch to
    # [M, B/M, ...] OUTSIDE shard_map and shards dim 1 over 'data', so
    # global microbatch m is the same frame set the single-device
    # grad-accumulation mate uses (a contiguous [B]-over-'data' shard
    # would interleave frames across microbatches and break exactness)
    xspec = P(None, DATA_AXIS, None, None, None)
    ticks = m_count + N_STAGES - 1
    fwd = [(s, s + 1) for s in range(N_STAGES - 1)]

    def sharded_loss(params, bn_state, xm):
        if not is_weight_shared(params):
            raise ValueError("pipeline parallelism supports weight-shared "
                             "models only (params must have no 'down' twin)")
        p = params["top"]
        m = xm.shape[1]                      # local microbatch size
        base = p["inc"]["conv1"]["w"].shape[-1]
        cdt = policy.compute_dtype
        buf0 = tuple(jnp.zeros(sh, cdt) for sh in _payload_shapes(
            2 * m, xm.shape[2], xm.shape[3], base))
        xm = jnp.concatenate(
            [xm, jnp.zeros((ticks - m_count,) + xm.shape[1:], xm.dtype)])
        s_idx = lax.axis_index(STAGE_AXIS)

        def tick(carry, xs_t):
            buf, bn, lacc = carry
            xt, t = xs_t
            recv = jax.tree.map(
                lambda a: lax.ppermute(a, STAGE_AXIS, fwd), buf)

            def run_encoder():
                x2b = jnp.concatenate([xt, complement(xt, bias)], axis=0)
                feats, ns = _encode(p, bn["top"], x2b, ops=ops,
                                    policy=policy)
                enc = {k: _mask_update(bn["top"][k], ns[k], t < m_count)
                       for k in _ENC_KEYS}
                new_bn = {"top": {**bn["top"], **enc}}
                return feats, new_bn, jnp.float32(0.0)

            def run_decoder():
                valid = (t >= 1) & (t < m_count + 1)
                loss_m, ns = _decode_loss(p, bn["top"], recv, ops=ops,
                                          policy=policy)
                dec = {k: _mask_update(bn["top"][k], ns[k], valid)
                       for k in _DEC_KEYS}
                new_bn = {"top": {**bn["top"], **dec}}
                out = jax.tree.map(jnp.zeros_like, recv)
                return out, new_bn, jnp.where(valid, loss_m, 0.0)

            out, new_bn, dl = lax.cond(s_idx == 0, run_encoder, run_decoder)
            return (out, new_bn, lacc + dl), None

        (_, bn_fin, lacc), _ = lax.scan(
            tick, (buf0, bn_state, jnp.float32(0.0)),
            (xm, jnp.arange(ticks)))
        # each stage owns its layers' BN leaves; psum of masked finals
        # reassembles the full replicated state
        merged = {}
        for key, sub in bn_fin["top"].items():
            w = (s_idx == (0 if key in _ENC_KEYS else 1)).astype(jnp.float32)
            merged[key] = jax.tree.map(
                lambda v: lax.psum(v * w, STAGE_AXIS), sub)
        loss = lax.pmean(lax.psum(lacc, STAGE_AXIS), DATA_AXIS) / m_count
        return loss, {"top": merged}

    # check_vma=False for the same reason as parallel/halo.py:155-161
    return jax.shard_map(sharded_loss, mesh=mesh,
                         in_specs=(P(), P(), xspec),
                         out_specs=(P(), P()), check_vma=False)


def make_pp_train_step(mesh, *, microbatches: int, policy: Policy = DEFAULT,
                       bias: float = 0.0):
    """Jitted pipelined train step over a ``('data', 'stage')`` mesh.

    Signature matches train.steps.make_train_step; params/BN/optimizer
    trees stay replicated; the batch shards over ``data`` and cuts into
    ``microbatches`` pipeline microbatches. Weight-shared models only.
    Semantics == make_train_step(microbatches=...) on one device
    (tests/test_pipeline_parallel.py).
    """
    m_count = int(microbatches)
    smapped = make_pp_loss_fn(mesh, microbatches=m_count, policy=policy,
                              bias=bias)
    n_data = int(mesh.shape[DATA_AXIS])

    def train_step(params, bn_state, opt_state, x, lr):
        n = x.shape[0]
        if n % m_count or (n // m_count) % n_data:
            raise ValueError(
                f"batch {n} not divisible into {m_count} microbatches of "
                f"{n_data} data shards")
        xm = x.reshape(m_count, n // m_count, *x.shape[1:])
        (loss, new_bn), grads = jax.value_and_grad(
            lambda pr: smapped(pr, bn_state, xm), has_aux=True)(params)
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda pa, u: pa + u, params, updates)
        return params, new_bn, opt_state, loss

    rep = replicated(mesh)
    # callers hand the usual batch-over-'data' array; the microbatch-major
    # reshard (one ICI shuffle) happens inside the jit
    xsh = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    return jax.jit(train_step, donate_argnums=(0, 1, 2),
                   in_shardings=(rep, rep, rep, xsh, None),
                   out_shardings=(rep, rep, rep, None))
