"""RSN (random-sampling-negative) ablation loss — models/onet.py::
compute_loss_rsn.

The reference ablates its complement-branch negatives against randomly
sampled in-batch negatives (the absent onet_ablation_RSN module its
train_rsn_model drivers consume, Train_Onet_on_zy3_20240606.py:225-269,
Train_Onet_on_simclutter_20250407.py:37,551-607; SURVEY section 2.9).
Rebuilt from the Deep-InfoMax convention the name describes, so the tests
assert the structural invariants: the negative comes from ANOTHER batch
image, the jsd machinery is unchanged, batch>=2 is enforced, and the
objective trains end to end through the standard step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.models.onet import (
    LOSSES, compute_loss, compute_loss_rsn, onet_forward, onet_init)
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


def _out(batch=4, key=0):
    params, bn = onet_init(jax.random.key(3), 1, base=8)
    x = jax.random.uniform(jax.random.key(key), (batch, 32, 32, 1))
    out, _ = onet_forward(params, bn, x, train=True)
    return out


def test_registry_and_batch_guard():
    assert LOSSES["jsd"] is compute_loss
    assert LOSSES["rsn"] is compute_loss_rsn
    with pytest.raises(ValueError, match="batch"):
        compute_loss_rsn(_out(batch=1))


def test_rsn_differs_from_jsd_but_matches_its_machinery():
    out = _out()
    l_jsd = float(compute_loss(out))
    l_rsn = float(compute_loss_rsn(out))
    assert np.isfinite(l_jsd) and np.isfinite(l_rsn)
    assert l_rsn != pytest.approx(l_jsd)
    # hand-rolled oracle: same symmetric jsd but with batch-rolled
    # negatives in place of the cross-branch score maps
    from onet_tpu.models.onet import jsd
    lt = jnp.sum(out.Lt.astype(jnp.float32), axis=-1)
    ld = jnp.sum(out.Ld.astype(jnp.float32), axis=-1)
    st, sd = out.S[..., 0], out.S[..., 1]
    want = -(jsd(lt, st, jnp.roll(st, 1, axis=0)) +
             jsd(ld, sd, jnp.roll(sd, 1, axis=0))) / 2.0
    assert l_rsn == pytest.approx(float(want), rel=1e-6)


def test_negative_is_cross_image():
    """Permuting which image pairs with which negative changes the loss
    (the positive term is permutation-invariant over the batch mean)."""
    out = _out(batch=4, key=7)
    base = float(compute_loss_rsn(out))
    # reverse the batch: positives identical as a set, pairings differ
    rev = jax.tree.map(lambda a: a[::-1], out)
    assert float(compute_loss_rsn(rev)) != pytest.approx(base, abs=1e-7)
    # jsd is pairing-free: reversal leaves it unchanged
    assert float(compute_loss(rev)) == pytest.approx(
        float(compute_loss(out)), rel=1e-6)


def test_rsn_trains_through_the_standard_step():
    rng = np.random.default_rng(0)
    n, h = 8, 32
    imgs = rng.rayleigh(0.15, size=(n, h, h)).astype(np.float32)
    for i in range(n):
        y, x = rng.integers(4, h - 10, 2)
        imgs[i, y:y + 6, x:x + 6] += 1.2
    imgs = imgs / imgs.max(axis=(1, 2), keepdims=True)
    xb = jnp.asarray(imgs)[..., None]

    params, bn = onet_init(jax.random.key(1), 1, base=8)
    opt = adam_init(params)
    step = make_train_step(loss="rsn")
    losses = []
    for _ in range(5):
        params, bn, opt, loss = step(params, bn, opt, xb, 2e-4)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"no learning: {losses}"
