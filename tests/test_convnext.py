"""ConvNeXt-UNet Onet family (models/convnext.py): shapes, twin-pass
batching exactness, depthwise-conv structure, gradient flow, train-step
integration, and a short unsupervised learning smoke.

Like the Swin family, the reference's ConvNeXt Onet variant module is
git-absent (Train_Onet_on_zy3_20240606.py:22-28, SURVEY section 2.9); the
family is rebuilt from the published ConvNeXt method, so the tests assert
the published structural invariants rather than torch-file parity.
"""

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.models.arch import get_arch
from onet_tpu.models.convnext import (
    convnext_onet_forward, convnext_onet_init, convnext_unet_apply)
from onet_tpu.models.onet import compute_loss

TINY = dict(embed_dim=16, depths=(1, 1, 2, 1))


def _init(key=0, in_channels=1, **kw):
    cfg = dict(TINY, **kw)
    return convnext_onet_init(jax.random.key(key), in_channels, **cfg)


def test_forward_shapes_and_finiteness():
    params, state = _init()
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    out, _ = convnext_onet_forward(params, state, x, train=True)
    assert out.Lt.shape == (2, 64, 64, 64)
    assert out.S.shape == (2, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(out.S)))
    np.testing.assert_allclose(np.asarray(out.S.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(float(compute_loss(out)))


def test_depthwise_conv_is_per_channel():
    """Zeroing one channel's depthwise filter must kill only that channel's
    depthwise contribution (feature_group_count structure)."""
    from onet_tpu.core.policy import DEFAULT
    from onet_tpu.models.convnext import _block, _block_init, _dwconv
    p = _block_init(jax.random.key(2), 8)
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 8))
    base = _block(p, x, DEFAULT)
    p2 = dict(p, dw=p["dw"].at[..., 3].set(0.0))
    pert = _block(p2, x, DEFAULT)
    # residual + MLP mix channels, so outputs differ everywhere — but the
    # depthwise stage itself must differ only at channel 3
    d1 = _dwconv(x, p["dw"], DEFAULT)
    d2 = _dwconv(x, p2["dw"], DEFAULT)
    diff = np.abs(np.asarray(d1 - d2)).max(axis=(0, 1, 2))
    assert diff[3] > 0
    np.testing.assert_array_equal(diff[np.arange(8) != 3], 0.0)
    # the block output shifts too, but only by ~gamma (layer scale 1e-6)
    assert float(np.abs(np.asarray(base - pert)).max()) > 0


def test_weight_shared_pass_matches_sequential_branches():
    params, state = _init(key=3)
    x = jax.random.uniform(jax.random.key(4), (2, 64, 64, 1))
    out, _ = convnext_onet_forward(params, state, x, train=False)
    from onet_tpu.ops.normalize import complement
    lt, ht = convnext_unet_apply(params["top"], x)
    ld, hd = convnext_unet_apply(params["top"], complement(x, 0.0))
    np.testing.assert_allclose(np.asarray(out.Lt), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)
    vt = np.asarray(jnp.sum(lt * ht, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vt), vt, rtol=2e-4, atol=2e-4)
    vd = np.asarray(jnp.sum(ld * hd, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vd), vd, rtol=2e-4, atol=2e-4)


def test_gradients_flow_to_every_parameter():
    params, state = _init(key=5)
    x = jax.random.uniform(jax.random.key(6), (2, 64, 64, 1))

    def loss_fn(p):
        out, _ = convnext_onet_forward(p, state, x, train=True)
        return compute_loss(out)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(path) for path, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not dead, f"zero-gradient leaves: {dead[:5]}"


def test_arch_registry_and_guards():
    import pytest
    from onet_tpu.train.steps import make_train_step

    arch = get_arch("convnext", convnext_embed=16)
    assert not arch.vanilla
    with pytest.raises(ValueError):
        make_train_step(forward=arch.forward, quantized="fwd")
    with pytest.raises(ValueError):
        arch.init(jax.random.key(0), 1, base=8)


def test_unsupervised_learning_smoke():
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    rng = np.random.default_rng(0)
    n, h = 8, 64
    imgs = rng.rayleigh(0.15, size=(n, h, h)).astype(np.float32)
    for i in range(n):
        y, x = rng.integers(8, h - 16, 2)
        imgs[i, y:y + 8, x:x + 8] += 1.2
    imgs = imgs / imgs.max(axis=(1, 2), keepdims=True)
    xb = jnp.asarray(imgs)[..., None]

    arch = get_arch("convnext", convnext_embed=16)
    params, state = convnext_onet_init(jax.random.key(7), 1, **TINY)
    opt = adam_init(params)
    step = make_train_step(forward=arch.forward)
    losses = []
    for _ in range(6):
        params, state, opt, loss = step(params, state, opt, xb, 3e-4)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"no learning: {losses}"
