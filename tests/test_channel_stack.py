"""Channel-stacked twin-branch execution == batch-stacked execution.

unet_apply_stacked runs the weight-shared complementary branches stacked on
the CHANNEL axis at the 64-channel levels with block-diagonal weights
(layers.bd2 / bd2_skip_up). The off-diagonal zero blocks contribute exact
+0 terms, so forward values and BN statistics must match the batch-stacked
reference path bit-for-bit (up to reduction-order float noise in grads).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.models.onet import onet_init, onet_forward, compute_loss
from onet_tpu.models import layers as L


@pytest.fixture(scope="module")
def setup():
    params, state = onet_init(jax.random.key(0), 1, base=8)
    x = jax.random.uniform(jax.random.key(1), (4, 32, 32, 1))
    return params, state, x


@pytest.mark.parametrize("dp_local", [False, True])
@pytest.mark.parametrize("train", [False, True])
def test_forward_equivalence(setup, train, dp_local):
    """Both middle-level batch layouts (block and dp-local interleave,
    unet_apply_stacked) must match the batch-stacked reference path."""
    params, state, x = setup
    o1, s1 = onet_forward(params, state, x, train=train, channel_stack=False)
    o2, s2 = onet_forward(params, state, x, train=train, channel_stack=True,
                          dp_local=dp_local)
    for name in ("Lt", "Ld", "Vt", "Vd", "S"):
        a = getattr(o1, name).astype(jnp.float32)
        b = getattr(o2, name).astype(jnp.float32)
        assert float(jnp.abs(a - b).max()) < 1e-6, name
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1, s2)
    assert max(jax.tree.leaves(errs)) < 1e-6


@pytest.mark.parametrize("dp_local", [False, True])
def test_gradient_equivalence(setup, dp_local):
    params, state, x = setup

    def loss_fn(p, stack):
        out, _ = onet_forward(p, state, x, train=True, channel_stack=stack,
                              dp_local=stack and dp_local)
        return compute_loss(out)

    g1 = jax.grad(lambda p: loss_fn(p, False))(params)
    g2 = jax.grad(lambda p: loss_fn(p, True))(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8)),
        g1, g2)
    assert max(jax.tree.leaves(rel)) < 1e-4


def test_bd2_structure():
    w = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    d = L.bd2(w)
    assert d.shape == (3, 3, 4, 8)
    np.testing.assert_array_equal(d[:, :, :2, :4], w)
    np.testing.assert_array_equal(d[:, :, 2:, 4:], w)
    np.testing.assert_array_equal(d[:, :, :2, 4:], np.zeros_like(w))
    np.testing.assert_array_equal(d[:, :, 2:, :4], np.zeros_like(w))


def test_bd2_skip_up_structure():
    """Per-branch input order (skip, up); global layout [s1|s2|u1|u2]."""
    ws = jnp.ones((1, 1, 2, 3))
    wu = 2 * jnp.ones((1, 1, 2, 3))
    w = jnp.concatenate([ws, wu], axis=2)          # [1,1,4,3]
    d = L.bd2_skip_up(w, c_skip=2)
    assert d.shape == (1, 1, 8, 6)
    np.testing.assert_array_equal(d[:, :, 0:2, 0:3], ws)   # s1 -> out0
    np.testing.assert_array_equal(d[:, :, 2:4, 3:6], ws)   # s2 -> out1
    np.testing.assert_array_equal(d[:, :, 4:6, 0:3], wu)   # u1 -> out0
    np.testing.assert_array_equal(d[:, :, 6:8, 3:6], wu)   # u2 -> out1
    np.testing.assert_array_equal(d[:, :, 0:2, 3:6], np.zeros((1, 1, 2, 3)))
    np.testing.assert_array_equal(d[:, :, 4:6, 3:6], np.zeros((1, 1, 2, 3)))


def test_stacked_bn_running_stats_match_sequential():
    """Stacked-channel BN EMA replays the same branch-ordered double EMA."""
    c = 6
    params, state = L.bn_init(c)
    x1 = jax.random.normal(jax.random.key(2), (3, 8, 8, c)) * 1.5 + 0.3
    x2 = jax.random.normal(jax.random.key(3), (3, 8, 8, c)) * 0.7 - 0.2
    # sequential torch-style: two separate calls through the same layer
    _, st = L.batch_norm(x1, params, state, train=True, groups=1)
    _, st = L.batch_norm(x2, params, st, train=True, groups=1)
    # stacked: one call with branch blocks on channels
    xs = jnp.concatenate([x1, x2], axis=-1)
    _, st2 = L.batch_norm(xs, params, state, train=True, groups=2,
                          stacked=True)
    np.testing.assert_allclose(np.asarray(st2["mean"]), np.asarray(st["mean"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(st2["var"]), np.asarray(st["var"]),
                               rtol=1e-6, atol=1e-7)


def test_stacked_head_matches_reshape_reduce():
    # the indicator-matmul head (onet.stacked_head) == [.., 2, C] reshape+sum
    loc = jax.random.normal(jax.random.key(2), (2, 8, 8, 16), jnp.bfloat16)
    glob = jax.random.normal(jax.random.key(3), (2, 8, 8, 16), jnp.bfloat16)
    from onet_tpu.models.onet import stacked_head
    v, lsum = stacked_head(loc, glob)
    lf = loc.astype(jnp.float32).reshape(2, 8, 8, 2, 8)
    gf = glob.astype(jnp.float32).reshape(2, 8, 8, 2, 8)
    np.testing.assert_allclose(np.asarray(v),
                               np.asarray(jnp.sum(lf * gf, -1)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lsum),
                               np.asarray(jnp.sum(lf, -1)),
                               rtol=1e-6, atol=1e-6)


def test_interleave_restack_roundtrip():
    """interleave_branches/restack_branches are exact inverses and place
    branch b of sample i at batch index 2i+b (the dp-shard-local layout
    that replaced the block concat, round-4 verdict task 3)."""
    h = jax.random.uniform(jax.random.key(3), (4, 6, 6, 10))
    c = 5
    il = L.interleave_branches(h)
    assert il.shape == (8, 6, 6, 5)
    for i in range(4):
        np.testing.assert_array_equal(il[2 * i], h[i, ..., :c])
        np.testing.assert_array_equal(il[2 * i + 1], h[i, ..., c:])
    np.testing.assert_array_equal(L.restack_branches(il), h)


@pytest.mark.parametrize("train", [True, False])
def test_interleaved_bn_matches_block(train):
    """Grouped BN on the interleaved layout == grouped BN on the block
    layout after permuting the batch axis: same y (permuted), same new
    running stats (same [G,C] statistics -> same EMA order)."""
    n, hw, c = 6, 5, 7
    key = jax.random.key(4)
    x_block = jax.random.normal(key, (2 * n, hw, hw, c))  # [br0 | br1]
    perm = np.arange(2 * n).reshape(2, n).T.reshape(-1)   # block -> interleaved
    x_il = x_block[perm]
    p, s = L.bn_init(c)
    p = {"scale": p["scale"] + 0.3, "bias": p["bias"] - 0.1}
    y_b, ns_b = L.batch_norm(x_block, p, s, train=train, groups=2)
    y_i, ns_i = L.batch_norm(x_il, p, s, train=train, groups=2,
                             interleaved=True)
    np.testing.assert_allclose(np.asarray(y_i), np.asarray(y_b[perm]),
                               rtol=0, atol=1e-6)
    for k in ns_b:
        np.testing.assert_allclose(np.asarray(ns_i[k]), np.asarray(ns_b[k]),
                                   rtol=0, atol=1e-6)


def test_interleaved_bn_gradients_match_block():
    n, hw, c = 4, 5, 7
    x_block = jax.random.normal(jax.random.key(5), (2 * n, hw, hw, c))
    perm = np.arange(2 * n).reshape(2, n).T.reshape(-1)
    x_il = x_block[perm]
    p, s = L.bn_init(c)

    def loss_block(xx, pp):
        y, _ = L.batch_norm(xx, pp, s, train=True, groups=2)
        return jnp.sum(jnp.sin(y))

    def loss_il(xx, pp):
        y, _ = L.batch_norm(xx, pp, s, train=True, groups=2,
                            interleaved=True)
        return jnp.sum(jnp.sin(y))

    gb_x, gb_p = jax.grad(loss_block, argnums=(0, 1))(x_block, p)
    gi_x, gi_p = jax.grad(loss_il, argnums=(0, 1))(x_il, p)
    np.testing.assert_allclose(np.asarray(gi_x), np.asarray(gb_x[perm]),
                               rtol=0, atol=1e-5)
    for k in gb_p:
        np.testing.assert_allclose(np.asarray(gi_p[k]), np.asarray(gb_p[k]),
                                   rtol=0, atol=1e-5)
