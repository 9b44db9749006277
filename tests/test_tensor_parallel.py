"""Channel tensor-parallelism (parallel/tensor.py) must match the
single-device step to fp-reassociation noise: the column/row-parallel
conv algebra, the channel-local BN, the psum_scatter partial sums, and
the psum'd projection head are all exact restructurings — only reduction
order differs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from onet_tpu.core.mesh import DATA_AXIS, make_mesh, replicated
from onet_tpu.models.onet import onet_init, onet_forward, compute_loss
from onet_tpu.parallel.tensor import (
    MODEL_AXIS, make_tp_train_step, unet_apply_tp)
from onet_tpu.parallel.halo import make_halo_ops
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


def _mesh_or_skip(data, model):
    if len(jax.devices()) < data * model:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(shape=(data, model),
                     devices=jax.devices()[:data * model],
                     axis_names=(DATA_AXIS, MODEL_AXIS))


def _copy(t):
    return jax.tree.map(lambda a: jnp.array(a, copy=True), t)


def _rels(ga, gb):
    out = []
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        out.append(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))
    return np.asarray(out)


@pytest.mark.parametrize("data,model", [(2, 2), (1, 4), (2, 4)])
def test_tp_step_matches_single_device(data, model):
    """(data x model) TP step == single-device step: loss, BN state, and
    the Adam update direction."""
    mesh = _mesh_or_skip(data, model)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))

    ref_step = make_train_step()
    p1, b1, o1, loss1 = ref_step(_copy(params), _copy(bn),
                                 adam_init(params), x, 1e-4)

    tp_step = make_tp_train_step(mesh)
    rep = replicated(mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    p2, b2, o2, loss2 = tp_step(jax.device_put(_copy(params), rep),
                                jax.device_put(_copy(bn), rep),
                                jax.device_put(adam_init(params), rep),
                                xs, 1e-4)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    # BN stats: per-channel sums reduce in a different order; the
    # E[x^2]-E[x]^2 cancellation amplifies fp32 noise (same tolerance as
    # test_spatial_halo)
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-3)
    # Adam normalizes first-step updates to ~+-lr, so reassociation noise
    # flips signs only where the true gradient ~ 0 (see test_spatial_halo)
    u1 = np.concatenate([np.ravel(np.asarray(a, np.float64)
                                  - np.asarray(a0, np.float64))
                         for a0, a in zip(jax.tree.leaves(params),
                                          jax.tree.leaves(p1))])
    u2 = np.concatenate([np.ravel(np.asarray(b, np.float64)
                                  - np.asarray(a0, np.float64))
                         for a0, b in zip(jax.tree.leaves(params),
                                          jax.tree.leaves(p2))])
    same_sign = float(np.mean(np.sign(u1) == np.sign(u2)))
    assert same_sign > 0.9, same_sign


def test_tp_gradients_exact():
    """Raw gradients of the TP loss vs the single-device loss: every leaf
    in the fp-noise class (rel < 5e-2, cos > 0.9995) — a mis-sliced weight
    or a mis-scaled psum transpose would blow both bounds."""
    mesh = _mesh_or_skip(2, 2)
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.asarray(np.random.default_rng(4)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))

    def loss_ref(p):
        out, _ = onet_forward(p, bn, x, train=True, channel_stack=False)
        return compute_loss(out)

    g1 = jax.grad(loss_ref)(params)

    tp_step_loss = make_tp_train_step(mesh)  # noqa: F841 (compile check)
    from onet_tpu.models.onet import _jsd_loss_pair
    from onet_tpu.ops.normalize import complement
    bn_op = make_halo_ops(1, bn_axes=(DATA_AXIS,)).batch_norm

    def sharded(p, xl):
        x2b = jnp.concatenate([xl, complement(xl, 0.0)], axis=0)
        (loc, glob), _ = unet_apply_tp(p["top"], bn["top"], x2b, t=2,
                                       bn=bn_op, train=True)
        locf = loc.astype(jnp.float32)
        v = lax.psum(jnp.sum(locf * glob.astype(jnp.float32), -1),
                     MODEL_AXIS)
        lsum = lax.psum(jnp.sum(locf, -1), MODEL_AXIS)
        b = xl.shape[0]
        vp = jnp.stack([v[:b], v[b:]], -1)
        lp = jnp.stack([lsum[:b], lsum[b:]], -1)
        return lax.pmean(_jsd_loss_pair(lp, jax.nn.softmax(vp, -1)),
                         DATA_AXIS)

    smapped = jax.shard_map(sharded, mesh=mesh,
                            in_specs=(P(), P(DATA_AXIS)),
                            out_specs=P(), check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    g2 = jax.jit(jax.grad(lambda p: smapped(p, xs)))(params)

    rel = _rels(g1, g2)
    assert rel.max() < 5e-2, rel.max()
    a = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g1)])
    c = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g2)])
    cos = (a * c).sum() / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
    assert cos > 0.9995, cos


def test_tp_forward_matches_unsharded():
    """unet_apply_tp's gathered (local, glob) == the plain unet_apply
    features (channel-block order restored by tiled all_gather)."""
    mesh = _mesh_or_skip(1, 2)
    from onet_tpu.models.unet import unet_apply, unet_init

    p, s = unet_init(jax.random.key(1), 1, base=8)
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))
    (loc1, glob1), _ = unet_apply(p, s, x, train=True, groups=2)

    bn_op = make_halo_ops(1, bn_axes=(DATA_AXIS,)).batch_norm

    def f(xl):
        (loc, glob), _ = unet_apply_tp(p, s, xl, t=2, bn=bn_op, train=True)
        return (lax.all_gather(loc, MODEL_AXIS, axis=3, tiled=True),
                lax.all_gather(glob, MODEL_AXIS, axis=3, tiled=True))

    loc2, glob2 = jax.shard_map(f, mesh=mesh, in_specs=P(),
                                out_specs=P(), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(loc2), np.asarray(loc1),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(glob2), np.asarray(glob1),
                               atol=1e-4, rtol=1e-3)
