"""log1pexp and normalization numerics."""

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.ops import log1pexp, minmax_per_frame, minmax_per_array, complement


def ref_log1pexp(x):
    out = np.empty_like(x)
    out[x <= -37] = np.exp(x[x <= -37])
    m = (x > -37) & (x <= 18)
    out[m] = np.log1p(np.exp(x[m]))
    m = (x > 18) & (x < 33.3)
    out[m] = x[m] + np.exp(-x[m])
    out[x >= 33.3] = x[x >= 33.3]
    return out


def test_log1pexp_matches_reference_branches():
    x = np.array([-1e4, -100, -37.0, -36.9, -5, 0, 3, 17.9, 18.0, 18.1,
                  30, 33.2, 33.3, 40, 1e4], np.float32)
    got = np.asarray(log1pexp(jnp.asarray(x)))
    # atol floor covers subnormal flush-to-zero (exp(-100)); rtol covers
    # XLA-vs-numpy transcendental ULP differences.
    np.testing.assert_allclose(got, ref_log1pexp(x), rtol=2e-4, atol=1e-37)


def test_log1pexp_grad_finite_everywhere():
    x = jnp.array([-1e4, -37.0, 0.0, 18.0, 33.3, 1e4], jnp.float32)
    g = jax.vmap(jax.grad(log1pexp))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # grad ~ sigmoid in the interior
    np.testing.assert_allclose(float(jax.grad(log1pexp)(jnp.float32(0.0))),
                               0.5, atol=1e-6)


def test_minmax_per_frame(rng):
    x = rng.normal(size=(4, 8, 8, 2)).astype(np.float32)
    y = np.asarray(minmax_per_frame(jnp.asarray(x)))
    assert y.shape == x.shape
    for n in range(4):
        for c in range(2):
            assert abs(y[n, :, :, c].min()) < 1e-6
            assert abs(y[n, :, :, c].max() - 1) < 1e-5


def test_minmax_per_array_and_complement(rng):
    x = rng.uniform(0, 5, size=(6, 6)).astype(np.float32)
    y = np.asarray(minmax_per_array(jnp.asarray(x)))
    assert y.min() >= 0 and y.max() <= 1
    c = np.asarray(complement(jnp.asarray(y), bias=0.0))
    np.testing.assert_allclose(c, np.clip(1 - y, 0, 1), atol=1e-7)
