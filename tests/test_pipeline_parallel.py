"""Pipeline parallelism (parallel/pipeline.py) must match its exactness
mate — the single-device gradient-accumulation step (same per-microbatch
BatchNorm statistics, same EMA threading order, same mean-of-microbatch
gradients into one Adam update) — to fp-reassociation noise. The GPipe
schedule, the ppermute payload hop, the bubble masking and the
data-axis BN psum are all exact restructurings of that computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from onet_tpu.core.mesh import DATA_AXIS, make_mesh, replicated
from onet_tpu.models.onet import onet_init, onet_forward, compute_loss
from onet_tpu.parallel.pipeline import (
    STAGE_AXIS, make_pp_loss_fn, make_pp_train_step)
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


def _mesh_or_skip(data, stage):
    if len(jax.devices()) < data * stage:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(shape=(data, stage),
                     devices=jax.devices()[:data * stage],
                     axis_names=(DATA_AXIS, STAGE_AXIS))


def _copy(t):
    return jax.tree.map(lambda a: jnp.array(a, copy=True), t)


def _microbatch_mate(params, bn, x, m_count):
    """The pipeline's exactness mate: sequential microbatch accumulation
    with the SAME forward form (batch-stacked pair, channel_stack=False).
    Mirrors train/steps.py::make_train_step(microbatches=...)."""
    xm = x.reshape(m_count, -1, *x.shape[1:])

    def micro(carry, xb):
        bnc, gsum, lsum = carry

        def loss_fn(p):
            out, nb = onet_forward(p, bnc, xb, train=True,
                                   channel_stack=False)
            return compute_loss(out), nb

        (loss, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return (nb, jax.tree.map(lambda a, b: a + b, gsum, g),
                lsum + loss), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    (new_bn, gsum, lsum), _ = jax.lax.scan(
        micro, (bn, zeros, jnp.float32(0.0)), xm)
    return lsum / m_count, new_bn, jax.tree.map(lambda g: g / m_count, gsum)


@pytest.mark.parametrize("data,micro", [(1, 2), (2, 2), (1, 4)])
def test_pp_step_matches_microbatch_mate(data, micro):
    """(data x stage) pipelined step == single-device microbatch
    accumulation: loss, BN state, and the Adam update direction."""
    mesh = _mesh_or_skip(data, 2)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))

    loss1, b1, g1 = jax.jit(
        lambda p, b: _microbatch_mate(p, b, x, micro))(params, _copy(bn))

    pp_step = make_pp_train_step(mesh, microbatches=micro)
    rep = replicated(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    p2, b2, o2, loss2 = pp_step(jax.device_put(_copy(params), rep),
                                jax.device_put(_copy(bn), rep),
                                jax.device_put(adam_init(params), rep),
                                xs, 1e-4)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    # BN stats tolerance: same reassociation argument as test_spatial_halo
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-3)
    # Adam first-step updates are ~+-lr; signs flip only where grad ~ 0
    u2 = np.concatenate([np.ravel(np.asarray(b, np.float64)
                                  - np.asarray(a0, np.float64))
                         for a0, b in zip(jax.tree.leaves(params),
                                          jax.tree.leaves(p2))])
    gflat = np.concatenate([np.ravel(np.asarray(g, np.float64))
                            for g in jax.tree.leaves(g1)])
    same_sign = float(np.mean(np.sign(-gflat) == np.sign(u2)))
    assert same_sign > 0.9, same_sign


def test_pp_gradients_exact():
    """Raw gradients of the pipelined loss vs the mate's accumulated
    gradients: every leaf within fp-noise bounds — a broken ppermute
    transpose, a bubble-tick leak, or a mis-masked BN update would blow
    them. Stage mesh only: the data-axis composition is covered bit-exactly
    by test_pp_data_axis_bitexact (at 1-frame shards the BN psum's
    E[x^2]-E[x]^2 cancellation pushes grad reassociation noise to ~8e-2,
    which a tolerance bound cannot distinguish from a routing bug — the
    duplicated-shard probe can)."""
    mesh = _mesh_or_skip(1, 2)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.asarray(np.random.default_rng(4)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))
    _, _, g1 = jax.jit(
        lambda p, b: _microbatch_mate(p, b, x, 2))(params, _copy(bn))

    smapped = make_pp_loss_fn(mesh, microbatches=2)
    xm = jax.device_put(x.reshape(2, 2, *x.shape[1:]),
                        NamedSharding(mesh, P(None, DATA_AXIS)))
    g2 = jax.jit(jax.grad(
        lambda p: smapped(p, bn, xm)[0]))(params)

    rels = []
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a = np.ravel(np.asarray(a, np.float64))
        b = np.ravel(np.asarray(b, np.float64))
        rels.append(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))
    rels = np.asarray(rels)
    assert rels.max() < 5e-2, rels.max()
    a = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g1)])
    c = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g2)])
    cos = (a * c).sum() / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > 0.9995, cos


def test_pp_data_axis_bitexact():
    """Data-axis routing probe: duplicate every microbatch's frame onto
    both data shards — the BN psum of identical shard sums is bit-exact,
    so the (2, 2) gradients must equal the (1, 2) gradients EXACTLY. Any
    frame mixup between shards/microbatches, a wrong pmean scale, or a
    missing BN psum shows up as a nonzero diff (measured during bring-up:
    the contiguous-shard microbatch interleave bug gave ~1e-1 here)."""
    _mesh_or_skip(2, 2)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    xh = jnp.asarray(np.random.default_rng(4)
                     .uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    xm1 = xh.reshape(2, 1, *xh.shape[1:])

    mesh1 = _mesh_or_skip(1, 2)
    sm1 = make_pp_loss_fn(mesh1, microbatches=2)
    g1 = jax.jit(jax.grad(lambda p: sm1(p, bn, xm1)[0]))(params)
    g1 = jax.tree.map(np.asarray, g1)

    mesh2 = _mesh_or_skip(2, 2)
    sm2 = make_pp_loss_fn(mesh2, microbatches=2)
    xm2 = jax.device_put(jnp.concatenate([xm1, xm1], axis=1),
                         NamedSharding(mesh2, P(None, DATA_AXIS)))
    g2 = jax.jit(jax.grad(lambda p: sm2(p, bn, xm2)[0]))(params)
    g2 = jax.tree.map(np.asarray, g2)

    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(a, b)


def test_pp_matches_public_microbatch_step():
    """Against the PUBLIC grad-accumulation step (channel-stacked form):
    the two forms differ only by exact restructurings, so loss and BN
    agree to slightly looser fp tolerance."""
    mesh = _mesh_or_skip(1, 2)
    params, bn = onet_init(jax.random.key(1), 1, base=8)
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))

    ref_step = make_train_step(microbatches=2)
    _, b1, _, loss1 = ref_step(_copy(params), _copy(bn),
                               adam_init(params), x, 1e-4)

    pp_step = make_pp_train_step(mesh, microbatches=2)
    rep = replicated(mesh)
    _, b2, _, loss2 = pp_step(jax.device_put(_copy(params), rep),
                              jax.device_put(_copy(bn), rep),
                              jax.device_put(adam_init(params), rep),
                              jax.device_put(x, NamedSharding(
                                  mesh, P(DATA_AXIS))), 1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_pp_collective_structure_mesh_independent():
    """Weak-scaling-style HLO evidence for the pipeline: with per-device
    batch fixed, growing the data axis must not change the collective
    structure (the scan body carries a fixed set of ppermutes and BN
    all-reduces per tick, whatever the mesh size)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    rows = []
    for data in (2, 4):
        mesh = _mesh_or_skip(data, 2)
        step = make_pp_train_step(mesh, microbatches=2)
        x = jax.ShapeDtypeStruct((4 * data, 32, 32, 1), jnp.float32)
        low = step.lower(params, bn, adam_init(params), x, 1e-4)
        st, hlo = low.as_text(), low.compile().as_text()
        rows.append((st.count("collective_permute"),
                     st.count("all_reduce"),
                     hlo.count("all-reduce(")))
    (cp0, ar0, car0), (cp1, ar1, car1) = rows
    assert cp0 > 0, "expected stage-hop collective-permutes"
    assert ar0 > 0, "expected BN/loss all-reduces"
    # program structure (StableHLO) is exactly mesh-independent, and so is
    # the compiled all-reduce count; the compiled collective-permute count
    # can differ by 1 (XLA lowers one small all-reduce as a permute on the
    # 2-device data axis — a lowering choice, not a scaling property)
    assert (cp0, ar0, car0) == (cp1, ar1, car1), rows


def test_pp_validates_shapes():
    mesh = _mesh_or_skip(1, 2)
    with pytest.raises(ValueError, match="stage"):
        make_pp_train_step(make_mesh(shape=(2, 1),
                                     devices=jax.devices()[:2],
                                     axis_names=(DATA_AXIS, STAGE_AXIS)),
                           microbatches=2)
    step = make_pp_train_step(mesh, microbatches=3)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.zeros((4, 32, 32, 1), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        step(params, bn, adam_init(params), x, 1e-4)
