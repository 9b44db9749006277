"""Jitted train / eval steps with mesh sharding.

One compiled function per workload: forward (fused complementary 2B pass)
-> JSD loss -> grads -> Adam, with donated params/opt-state buffers so the
update is in-place in HBM. Batches shard over the mesh ``data`` axis
(optionally ``space`` over H); params/optimizer state are replicated and
GSPMD inserts the gradient all-reduce over ICI — this *is* the data-parallel
training the reference lacks (SURVEY.md section 2.10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from onet_tpu.core.mesh import batch_sharding, replicated, DATA_AXIS, SPACE_AXIS
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models.onet import (onet_forward, compute_loss, LOSSES,
                                  predict_label)
from onet_tpu.train.optim import adam_update
from onet_tpu.metrics.segmentation import (
    evaluate_binary_segmentation,
    align_labels_by_accuracy,
    align_labels_hungarian,
)


def _make_reshard(mesh, spatial: bool):
    """Per-level sharding constraints for spatial partitioning: the large
    shallow levels stay split over ('data','space'); the small deep levels
    (H/4 and below) replicate the spatial axis.

    STATUS (measured on the virtual mesh): spatial partitioning is EXACT in
    the forward/inference path; GSPMD's conv/select_and_scatter BACKWARD
    under spatial sharding is approximate (grad direction cos > 0.999 at
    healthy >=4-row shards, corrupted at 1-row shards; replicating deep
    levels mitigates). Training therefore defaults to pure data
    parallelism; use spatial=True for inference over huge tiles or accept
    documented-approximate grads. Exact spatial training needs
    halo-exchange-aware custom kernels (ROADMAP.md)."""
    if mesh is None or not spatial or SPACE_AXIS not in mesh.axis_names:
        return None
    deep = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    shallow = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))

    def rs(tag, x):
        return jax.lax.with_sharding_constraint(
            x, deep if tag == "deep" else shallow)

    return rs


def make_train_step(*, policy: Policy = DEFAULT, bias: float = 0.0,
                    mesh=None, spatial: bool = False, microbatches: int = 1,
                    quantized: str = None, forward=None, loss: str = "jsd"):
    """Build the jitted train step:
    (params, bn_state, opt_state, x, lr) -> (params, bn_state, opt_state, loss)

    ``microbatches=k`` accumulates gradients over k sequential slices of the
    batch (lax.scan) before ONE Adam update — batches beyond HBM capacity
    at full-batch optimizer semantics. The loss/gradient is the mean over
    microbatches; BatchNorm batch statistics are per-microbatch with the
    running EMA threaded sequentially (the reference's sequential-small-
    batches behavior). When every microbatch has the same batch statistics
    the accumulated step is numerically identical to the full-batch step
    (tests/test_microbatch.py).

    ``quantized`` (opt-in; None = exact): "fwd" runs the 3x3 convs with
    int8 forward arithmetic, "fwd+dx" additionally the input-gradient
    convs (models/qtrain.py) — the reduced-precision training mode SOL.md
    derives as required to beat the bf16 ceiling. Gate on mask agreement
    before production use (tests/test_qtrain.py, runs/qtrain_validate.py).

    ``forward`` (models/arch.py): an alternate-backbone forward with the
    onet_forward signature. The conv-specific machinery (spatial halos,
    int8 ops) applies to the vanilla backbone only.

    ``loss``: "jsd" (the reference objective) or "rsn" (the
    random-sampling-negative ablation, models/onet.py::compute_loss_rsn).
    """
    custom_fwd = forward is not None and forward is not onet_forward
    if custom_fwd and (quantized or spatial):
        raise ValueError("quantized / spatial training applies to the "
                         "vanilla conv backbone only")
    reshard = _make_reshard(mesh, spatial)
    if quantized:
        from onet_tpu.models.qtrain import make_qtrain_ops
        ops = make_qtrain_ops(level=quantized)
    else:
        from onet_tpu.models.unet import DEFAULT_OPS
        ops = DEFAULT_OPS

    loss_of = LOSSES[loss]
    # Under a mesh (plain-jit/GSPMD, with or without the spatial axis:
    # the batch stays sharded over 'data' either way) the twin-branch
    # restack must be sample-interleaved or GSPMD redistributes GB-scale
    # activations across the data axis (RESULTS.md round 5). Single-chip
    # keeps the block layout (faster; XLA fuses the concat/slices). The
    # shard_map spatial step (parallel/halo.py) is built elsewhere and
    # stays block — shard-local by construction inside shard_map.
    dp_local = mesh is not None

    def grads_of(params, bn_state, x):
        def loss_fn(p):
            if custom_fwd:
                out, new_bn = forward(p, bn_state, x, train=True,
                                      bias=bias, policy=policy)
            else:
                out, new_bn = onet_forward(p, bn_state, x, train=True,
                                           bias=bias, policy=policy,
                                           reshard=reshard, ops=ops,
                                           dp_local=dp_local)
            return loss_of(out), new_bn

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(params, bn_state, opt_state, x, lr):
        if microbatches == 1:
            (loss, new_bn), grads = grads_of(params, bn_state, x)
        else:
            n = x.shape[0]
            if n % microbatches:
                raise ValueError(f"batch {n} not divisible by "
                                 f"{microbatches} microbatches")
            xm = x.reshape(microbatches, n // microbatches, *x.shape[1:])

            def micro(carry, xb):
                bn, gsum, lsum = carry
                (loss, new_bn), g = grads_of(params, bn, xb)
                gsum = jax.tree.map(lambda a, b: a + b, gsum, g)
                return (new_bn, gsum, lsum + loss), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (new_bn, gsum, lsum), _ = jax.lax.scan(
                micro, (bn_state, zeros, jnp.float32(0.0)), xm)
            grads = jax.tree.map(lambda g: g / microbatches, gsum)
            loss = lsum / microbatches
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    rep = replicated(mesh)
    xsh = batch_sharding(mesh, spatial=spatial)
    return jax.jit(
        train_step,
        donate_argnums=(0, 1, 2),
        in_shardings=(rep, rep, rep, xsh, None),
        out_shardings=(rep, rep, rep, None),
    )


def make_eval_step(*, policy: Policy = DEFAULT, bias: float = 0.0,
                   align: str = "flip", mesh=None, spatial: bool = False,
                   forward=None, loss: str = "jsd"):
    """Build the jitted eval step returning per-batch metrics.

    align: 'flip'      — re_assign_label accuracy flip test (simclutter/nau
                         eval, Train_Onet_on_simclutter_20250407.py:128),
           'hungarian' — K=2 Hungarian reorder (zy3 eval,
                         uti_zy3_test_20240123.py:174),
           'none'      — raw argmax.
    Returns (metrics dict, loss, pred_labels).
    """

    reshard = _make_reshard(mesh, spatial)
    fwd = forward or onet_forward
    fwd_kw = {} if forward not in (None, onet_forward) else {
        "reshard": reshard,
        # shard-local twin restack under plain-jit dp (see make_train_step)
        "dp_local": mesh is not None}

    loss_of = LOSSES[loss]

    def eval_step(params, bn_state, x, labels):
        out, _ = fwd(params, bn_state, x, train=False,
                     bias=bias, policy=policy, **fwd_kw)
        loss = loss_of(out)
        pred = predict_label(out.S)
        if align == "flip":
            pred = align_labels_by_accuracy(pred, labels)
        elif align == "hungarian":
            pred = align_labels_hungarian(pred, labels)
        metrics = evaluate_binary_segmentation(pred, labels)
        return metrics, loss, pred

    if mesh is None:
        return jax.jit(eval_step)

    rep = replicated(mesh)
    xsh = batch_sharding(mesh, spatial=spatial)
    lsh = batch_sharding(mesh, spatial=spatial, rank=3)
    return jax.jit(eval_step, in_shardings=(rep, rep, xsh, lsh))
