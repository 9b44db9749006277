"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.models.onet import OnetOutput, compute_loss, channel_dot
from onet_tpu.ops.pallas_head import fused_jsd_loss, minmax_complement
from onet_tpu.ops.normalize import minmax_per_array, complement


def make_feats(rng, b=2, h=8, w=16, c=8):
    def t():
        return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    return t(), t(), t(), t()


def xla_reference(lt, ht, ld, hd):
    vt = channel_dot(lt, ht)
    vd = channel_dot(ld, hd)
    s = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    out = OnetOutput(Lt=lt, Ld=ld, Vt=vt, Vd=vd, S=s)
    return vt, vd, compute_loss(out)


def test_fused_head_forward_matches_xla(rng):
    lt, ht, ld, hd = make_feats(rng)
    loss = fused_jsd_loss(lt, ht, ld, hd)
    _, _, loss_r = xla_reference(lt, ht, ld, hd)
    np.testing.assert_allclose(float(loss), float(loss_r), rtol=1e-5)


def test_fused_head_grads_match_xla(rng):
    lt, ht, ld, hd = make_feats(rng)

    def f_pallas(*a):
        return fused_jsd_loss(*a)

    def f_xla(*a):
        return xla_reference(*a)[2]

    g_p = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(lt, ht, ld, hd)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2, 3))(lt, ht, ld, hd)
    for a, b, name in zip(g_p, g_x, "Lt Ht Ld Hd".split()):
        denom = np.abs(np.asarray(b)).max() + 1e-12
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        assert err < 2e-4, (name, err)


def test_fused_head_bf16_inputs(rng):
    lt, ht, ld, hd = (a.astype(jnp.bfloat16) for a in make_feats(rng))
    loss = fused_jsd_loss(lt, ht, ld, hd)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda *a: fused_jsd_loss(*a), argnums=0)(lt, ht, ld, hd)
    assert g.dtype == jnp.bfloat16


def test_minmax_complement_matches_ops(rng):
    x = jnp.asarray(rng.uniform(0, 7, size=(3, 8, 16, 1)).astype(np.float32))
    xn, xc = minmax_complement(x)
    for i in range(3):
        ref_n = minmax_per_array(x[i])
        np.testing.assert_allclose(np.asarray(xn[i]), np.asarray(ref_n),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(xc[i]),
                                   np.asarray(complement(ref_n)), atol=1e-6)
