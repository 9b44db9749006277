"""Gradient-accumulation microbatching mechanics.

Exact-equality construction: with the batch built as k copies of the same
frame set, each microbatch's BatchNorm statistics equal the full-batch
statistics, so the accumulated step must reproduce the full-batch step to
fp tolerance — a rigorous test of the accumulation/averaging mechanics.
(On non-replicated data, per-microbatch BN statistics legitimately differ
from full-batch BN: that is the reference's sequential-batch semantics.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.models.onet import onet_init
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


def _copy(t):
    return jax.tree.map(lambda a: jnp.array(a, copy=True), t)


def test_microbatched_equals_full_batch_on_replicated_data():
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    base = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1))
    x = jnp.asarray(np.concatenate([base] * 3).astype(np.float32))  # 3 copies

    full = make_train_step()
    p1, b1, o1, loss1 = full(_copy(params), _copy(bn), adam_init(params),
                             x, 1e-4)

    micro = make_train_step(microbatches=3)
    p2, b2, o2, loss2 = micro(_copy(params), _copy(bn), adam_init(params),
                              x, 1e-4)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-6)
    # Adam's first-step update is ~+-lr elementwise, so fp-noise-level
    # gradient differences bound the param delta by ~2*lr on sign-flip
    # elements; everything above that would be an accumulation bug.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-4, rtol=1e-4)
    u1 = np.concatenate([np.ravel(np.asarray(a, np.float64)
                                  - np.asarray(a0, np.float64))
                         for a0, a in zip(jax.tree.leaves(params),
                                          jax.tree.leaves(p1))])
    u2 = np.concatenate([np.ravel(np.asarray(b, np.float64)
                                  - np.asarray(a0, np.float64))
                         for a0, b in zip(jax.tree.leaves(params),
                                          jax.tree.leaves(p2))])
    assert float(np.mean(np.sign(u1) == np.sign(u2))) > 0.95
    # BN running state: 3 sequential EMA updates with identical stats vs
    # one update — these MUST differ (documented semantics); check the
    # microbatched EMA applied the update 3 times
    m1 = jax.tree.leaves(b1)[0]
    m2 = jax.tree.leaves(b2)[0]
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_microbatched_runs_on_mixed_data():
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(0, 1, (6, 32, 32, 1)).astype(np.float32))
    step = make_train_step(microbatches=2)
    p, b, o, loss = step(params, bn, adam_init(params), x, 1e-4)
    assert np.isfinite(float(loss))


def test_microbatch_divisibility_error():
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    x = jnp.zeros((5, 32, 32, 1), jnp.float32)
    step = make_train_step(microbatches=2)
    with pytest.raises(ValueError):
        step(params, bn, adam_init(params), x, 1e-4)
