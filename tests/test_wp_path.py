"""Width-pair-packed model path vs the channel-stacked path (CPU,
interpreter mode): same math up to float reassociation — probabilities,
loss, BatchNorm running stats and gradients must land in the fp-noise
class, and masks must agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import onet_tpu.ops.pallas_conv as PC
from onet_tpu.models.onet import onet_init, onet_forward, compute_loss


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PC, "INTERPRET", True)


@pytest.fixture(scope="module")
def setup():
    params, state = onet_init(jax.random.key(0), 1)  # base=64 (wp geometry)
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    return params, state, x


def _copy(t):
    return jax.tree.map(lambda a: jnp.array(a, copy=True), t)


@pytest.mark.parametrize("train", [False, True])
def test_forward_parity(setup, train):
    params, state, x = setup
    out_s, st_s = onet_forward(params, _copy(state), x, train=train,
                               pair_pack=False)
    out_w, st_w = onet_forward(params, _copy(state), x, train=train,
                               pair_pack=True)
    np.testing.assert_allclose(np.asarray(out_w.S), np.asarray(out_s.S),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_w.Vt), np.asarray(out_s.Vt),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_w.Lsum),
                               np.asarray(out_s.Lsum),
                               atol=2e-3, rtol=1e-3)
    agree = float(jnp.mean((jnp.argmax(out_w.S, -1)
                            == jnp.argmax(out_s.S, -1)).astype(jnp.float32)))
    assert agree > 0.999, agree
    if train:
        # BatchNorm running stats: same sums in a different reduction order
        for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_w)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-3)


def test_loss_and_grads_parity(setup):
    params, state, x = setup

    def loss_fn(p, wp):
        out, _ = onet_forward(p, state, x, train=True, pair_pack=wp)
        return compute_loss(out)

    l_s, g_s = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l_w, g_w = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l_w), float(l_s), rtol=1e-4)
    a = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g_s)])
    b = np.concatenate([np.ravel(np.asarray(t, np.float64))
                        for t in jax.tree.leaves(g_w)])
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    assert rel < 2e-2, rel


def test_wp_falls_back_off_geometry(setup):
    params, state, _ = setup
    # odd-ish width -> wp_supported False -> stacked path executes fine
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (1, 32, 30, 1)).astype(np.float32))
    out, _ = onet_forward(params, _copy(state), x, train=False,
                          pair_pack=True)
    assert out.S.shape == (1, 32, 30, 2)


def test_infer_parity(setup):
    from onet_tpu.models.infer import fold_onet, onet_infer

    params, state, x = setup
    folded = fold_onet(params, state)
    s_s, lab_s = onet_infer(folded, x, pair_pack=False)
    s_w, lab_w = onet_infer(folded, x, pair_pack=True)
    agree = float(jnp.mean((lab_w == lab_s).astype(jnp.float32)))
    assert agree > 0.999, agree
    np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_s),
                               atol=5e-3, rtol=1e-2)
