"""Pair-packed Pallas conv kernels vs the XLA reference conv (CPU,
interpreter mode). Exactness contract: identical up to f32 reassociation
of the 9-tap sum. Shapes cover the integration sites: 64->64 (inc.conv2 /
up4.conv2 class) on even/odd-ish block splits and multi-sample batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import onet_tpu.ops.pallas_conv as PC


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PC, "INTERPRET", True)


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("n,h,w", [(2, 32, 32), (1, 16, 64), (3, 48, 16)])
def test_fwd_matches_xla(n, h, w):
    rng = np.random.default_rng(h + w)
    x = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 64, 64)) * 0.05)
                     .astype(np.float32))
    ref = _ref_conv(x, wt)
    y, s1, s2 = PC.conv3x3_wp(x.reshape(n, h, w // 2, 128), wt)
    np.testing.assert_allclose(np.asarray(y.reshape(n, h, w, 64)),
                               np.asarray(ref), atol=2e-5, rtol=1e-5)
    yf = y.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(yf, axis=(1, 2))),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(yf ** 2, axis=(1, 2))),
                               rtol=1e-4, atol=1e-2)


def test_grads_match_xla():
    rng = np.random.default_rng(0)
    n, h, w = 2, 32, 32
    x = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 64, 64)) * 0.05)
                     .astype(np.float32))

    def loss_p(xp, wt):
        y, _, _ = PC.conv3x3_wp(xp, wt)
        return jnp.sum(jnp.sin(y))

    def loss_r(x, wt):
        return jnp.sum(jnp.sin(_ref_conv(x, wt)))

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(
        x.reshape(n, h, w // 2, 128), wt)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_p.reshape(n, h, w, 64)),
                               np.asarray(gx_r), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-3, rtol=1e-4)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(3, 8, 10, 128)).astype(np.float32))
    assert np.allclose(np.asarray(PC.unpack_wp(PC.pack_wp(xs))),
                       np.asarray(xs))
    # pack semantics: branch b channel block -> batch slot b*B+n with
    # lanes (w%2)*64 + c
    p = PC.pack_wp(xs)
    b = xs.shape[0]
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, :64]),
                                  np.asarray(xs[0, 0, 0, :64]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 64:]),
                                  np.asarray(xs[0, 0, 1, :64]))
    np.testing.assert_array_equal(np.asarray(p[b, 0, 0, :64]),
                                  np.asarray(xs[0, 0, 0, 64:]))


def test_flip_transpose_is_vjp_weight():
    # conv(x, W)^T cotangent structure: <conv(x,W), g> == <x, conv(g, W')>
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32))
    lhs = jnp.sum(_ref_conv(x, wt) * g)
    rhs = jnp.sum(x * _ref_conv(g, PC.flip_transpose(wt)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_two_input_conv_matches_concat_conv():
    """conv3x3_wp2(skip, up, wa, wb) == conv over concat(skip, up) with the
    [3,3,128,64] weight split at input-channel 64 — forward and grads."""
    rng = np.random.default_rng(3)
    n, h, w = 2, 16, 32
    xa = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    wfull = jnp.asarray((rng.normal(size=(3, 3, 128, 64)) * 0.05)
                        .astype(np.float32))
    ref = _ref_conv(jnp.concatenate([xa, xb], axis=-1), wfull)

    ap = xa.reshape(n, h, w // 2, 128)
    bp = xb.reshape(n, h, w // 2, 128)
    y, s1, s2 = PC.conv3x3_wp2(ap, bp, wfull[:, :, :64], wfull[:, :, 64:])
    np.testing.assert_allclose(np.asarray(y.reshape(n, h, w, 64)),
                               np.asarray(ref), atol=3e-5, rtol=1e-5)

    def loss_p(ap, bp, wf):
        y, _, _ = PC.conv3x3_wp2(ap, bp, wf[:, :, :64], wf[:, :, 64:])
        return jnp.sum(jnp.sin(y))

    def loss_r(xa, xb, wf):
        return jnp.sum(jnp.sin(_ref_conv(jnp.concatenate([xa, xb], -1), wf)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(ap, bp, wfull)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xa, xb, wfull)
    np.testing.assert_allclose(np.asarray(gp[0].reshape(n, h, w, 64)),
                               np.asarray(gr[0]), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1].reshape(n, h, w, 64)),
                               np.asarray(gr[1]), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gr[2]),
                               atol=2e-3, rtol=1e-4)


def test_bias_relu_epilogue():
    rng = np.random.default_rng(4)
    n, h, w = 1, 16, 32
    x = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 64, 64)) * 0.1)
                     .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref = jnp.maximum(_ref_conv(x, wt) + b, 0.0)
    wc, we = PC.make_wc_we(wt, dtype=x.dtype)
    y = PC.conv3x3_wp_raw(x.reshape(n, h, w // 2, 128), wc, we,
                          bias=jnp.tile(b, 2), bias_relu=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(y.reshape(n, h, w, 64)),
                               np.asarray(ref), atol=2e-5, rtol=1e-5)
