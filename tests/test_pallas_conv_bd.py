"""Exactness tests for the native-layout conv+stats kernel
(ops/pallas_conv_bd.py) — interpret mode on CPU, compiled when a TPU is
attached. Contract: matches lax.conv_general_dilated on the SAME stacked
layout up to f32 reassociation of the 9-tap sum; the stats outputs match
per-lane sums of the f32 conv output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onet_tpu.models.layers import bd2
from onet_tpu.ops.pallas_conv_bd import (
    conv3x3_bd_raw, conv3x3_bd2in_raw, xla_conv_stats)

_INTERP = jax.default_backend() == "cpu"


def _mk(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("rblk", [4, 8])
def test_bd_conv_matches_xla(rblk):
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _mk(k[0], (2, 16, 16, 128))
    w = bd2(_mk(k[1], (3, 3, 64, 64)))
    y, s1, s2 = conv3x3_bd_raw(x, w, rblk=rblk, stats=True,
                               interpret=_INTERP)
    yr, s1r, s2r = xla_conv_stats(x, w)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0.05, atol=0.05)
    # stats: kernel sums the f32 accumulator; oracle sums the upcast bf16
    # output — agreement to bf16 rounding level over 512 pixels/lane
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=0.02, atol=2.0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=0.02, atol=2.0)


def test_bd_conv_two_input_matches_concat():
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    xa = _mk(k[0], (2, 16, 16, 128))
    xb = _mk(k[1], (2, 16, 16, 128))
    wa = bd2(_mk(k[2], (3, 3, 64, 64)))
    wb = bd2(_mk(k[3], (3, 3, 64, 64)))
    y, s1, s2 = conv3x3_bd2in_raw(xa, xb, wa, wb, rblk=8, stats=True,
                                  interpret=_INTERP)
    # oracle: concat inputs, stack weights on the input-channel axis
    xcat = jnp.concatenate([xa, xb], axis=-1)
    wcat = jnp.concatenate([wa, wb], axis=2)
    yr, s1r, s2r = xla_conv_stats(xcat, wcat)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0.05, atol=0.08)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=0.02, atol=3.0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=0.02, atol=3.0)


def test_bd_conv_no_stats_path():
    k = jax.random.split(jax.random.PRNGKey(2), 2)
    x = _mk(k[0], (1, 8, 8, 128))
    w = bd2(_mk(k[1], (3, 3, 64, 64)))
    y = conv3x3_bd_raw(x, w, rblk=4, stats=False, interpret=_INTERP)
    yr, _, _ = xla_conv_stats(x, w)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0.05, atol=0.05)
