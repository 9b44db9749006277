"""TransUNet Onet family (models/transunet.py): shapes, twin-pass batching
exactness, position-embedding transfer, gradient flow, train-step
integration, and a short unsupervised learning smoke.

Like the Swin/ConvNeXt families, the reference's TransUNet Onet variant
module is git-absent (Train_Onet_on_zy3_20240606.py:22-28 imports
Onet_Trans_Unet_20240613; SURVEY section 2.9); the family is rebuilt from
the published TransUNet method, so the tests assert the published
structural invariants rather than torch-file parity.
"""

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.models.arch import get_arch
from onet_tpu.models.onet import compute_loss
from onet_tpu.models.transunet import (
    transunet_apply, transunet_onet_forward, transunet_onet_init)

TINY = dict(embed_dim=96, depth=2, img_size=64)


def _init(key=0, in_channels=1, **kw):
    cfg = dict(TINY, **kw)
    return transunet_onet_init(jax.random.key(key), in_channels, **cfg)


def test_forward_shapes_and_finiteness():
    params, state = _init()
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    out, _ = transunet_onet_forward(params, state, x, train=True)
    assert out.Lt.shape == (2, 64, 64, 64)
    assert out.S.shape == (2, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(out.S)))
    np.testing.assert_allclose(np.asarray(out.S.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(float(compute_loss(out)))


def test_embed_divisibility_and_input_guards():
    import pytest
    with pytest.raises(ValueError, match="divisible by 48"):
        _init(embed_dim=100)
    params, state = _init()
    bad = jnp.zeros((1, 40, 40, 1))  # 40 % 16 != 0
    with pytest.raises(ValueError, match="divisible by 16"):
        transunet_onet_forward(params, state, bad)


def test_position_embedding_transfers_across_grids():
    """Init at img_size=64 (4x4 token grid), apply at 32^2 (2x2 grid):
    the learned pos-emb must be bilinearly resized, not crash (the
    published ViT transfer rule)."""
    params, state = _init(key=2)
    assert params["top"]["pos"].shape[:2] == (4, 4)
    x = jax.random.uniform(jax.random.key(3), (1, 32, 32, 1))
    out, _ = transunet_onet_forward(params, state, x)
    assert out.S.shape == (1, 32, 32, 2)
    assert bool(jnp.all(jnp.isfinite(out.S)))


def test_weight_shared_pass_matches_sequential_branches():
    params, state = _init(key=3)
    x = jax.random.uniform(jax.random.key(4), (2, 64, 64, 1))
    out, _ = transunet_onet_forward(params, state, x, train=False)
    from onet_tpu.ops.normalize import complement
    lt, ht = transunet_apply(params["top"], x)
    ld, hd = transunet_apply(params["top"], complement(x, 0.0))
    np.testing.assert_allclose(np.asarray(out.Lt), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)
    vt = np.asarray(jnp.sum(lt * ht, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vt), vt, rtol=2e-3, atol=5e-4)
    vd = np.asarray(jnp.sum(ld * hd, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vd), vd, rtol=2e-3, atol=5e-4)


def test_gradients_flow_to_every_parameter():
    params, state = _init(key=5)
    x = jax.random.uniform(jax.random.key(6), (2, 64, 64, 1))

    def loss_fn(p):
        out, _ = transunet_onet_forward(p, state, x, train=True)
        return compute_loss(out)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(path) for path, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not dead, f"zero-gradient leaves: {dead[:5]}"


def test_twin_no_share_has_independent_branches():
    params, state = _init(key=7, weight_share=False)
    assert "down" in params
    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 1))
    out, _ = transunet_onet_forward(params, state, x)
    assert out.S.shape == (1, 64, 64, 2)


def test_arch_registry_and_guards():
    import pytest
    from onet_tpu.train.steps import make_train_step

    arch = get_arch("transunet", transunet_embed=96, transunet_depth=2)
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

    arch = get_arch("transunet", transunet_embed=96, transunet_depth=2)
    params, state = transunet_onet_init(jax.random.key(7), 1, **TINY)
    opt = adam_init(params)
    step = make_train_step(forward=arch.forward)
    losses = []
    for _ in range(6):
        params, state, opt, loss = step(params, state, opt, xb, 3e-4)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"no learning: {losses}"
