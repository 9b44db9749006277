"""Swin-Unet Onet family (models/swin.py): geometry, attention-mask
structure, twin-pass batching exactness (the LayerNorm analogue of the
grouped-BN contract), gradient flow, train-step integration, checkpoint
round-trip, and a short unsupervised learning smoke on the toy clutter.

The reference's Onet_Swin_Unet module is absent from the snapshot
(Train_Onet_on_zy3_20240606.py:313-382, SURVEY section 2.9); the family is
rebuilt from the published Swin/Swin-Unet methods, so the tests assert the
published structural invariants rather than parity against a torch file.
"""

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.models.arch import get_arch
from onet_tpu.models.onet import compute_loss, predict_label
from onet_tpu.models.swin import (
    _rel_pos_index, _shift_mask, swin_onet_forward, swin_onet_init,
    swin_unet_apply)

TINY = dict(window=2, embed_dim=12)   # stages 16/8/4/2 on a 64^2 input


def _init(key=0, in_channels=1, **kw):
    cfg = dict(TINY, **kw)
    return swin_onet_init(jax.random.key(key), in_channels, **cfg)


def test_rel_pos_index_structure():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    # diagonal = the zero-displacement bucket (center of the 5x5 table)
    assert np.all(np.diag(idx) == idx[0, 0])
    assert idx.min() >= 0 and idx.max() < 25
    # displacement (i->j) and (j->i) hit buckets mirrored about the center
    assert idx[0, 8] + idx[8, 0] == 24


def test_shift_mask_blocks_cross_region_pairs():
    m = _shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # the top-left window contains no seam: fully unmasked
    np.testing.assert_array_equal(m[0], 0.0)
    # the bottom-right window mixes 4 wrapped regions: both mask values
    # present and the masked/unmasked pattern is symmetric
    assert (m[-1] < 0).any() and (m[-1] == 0).any()
    np.testing.assert_array_equal(m[-1], m[-1].T)


def test_forward_shapes_and_finiteness():
    params, state = _init()
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    out, new_state = swin_onet_forward(params, state, x, train=True)
    assert out.Lt.shape == (2, 64, 64, 64)
    assert out.S.shape == (2, 64, 64, 2)
    assert out.Vt.shape == (2, 64, 64)
    assert bool(jnp.all(jnp.isfinite(out.S)))
    np.testing.assert_allclose(np.asarray(out.S.sum(-1)), 1.0, atol=1e-5)
    loss = compute_loss(out)
    assert np.isfinite(float(loss))


def test_weight_shared_pass_matches_sequential_branches():
    """The [2B] batch-stacked twin pass must equal running each branch
    alone — LayerNorm makes this structural, but the window/roll/mask
    plumbing must not couple samples either."""
    params, state = _init(key=3)
    x = jax.random.uniform(jax.random.key(4), (2, 64, 64, 1))
    out, _ = swin_onet_forward(params, state, x, train=False)
    from onet_tpu.ops.normalize import complement
    lt, ht = swin_unet_apply(params["top"], x)
    ld, hd = swin_unet_apply(params["top"], complement(x, 0.0))
    np.testing.assert_allclose(np.asarray(out.Lt), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)
    vt = np.asarray(jnp.sum(lt * ht, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vt), vt, rtol=2e-4,
                               atol=2e-4)
    vd = np.asarray(jnp.sum(ld * hd, axis=-1))
    np.testing.assert_allclose(np.asarray(out.Vd), vd, rtol=2e-4,
                               atol=2e-4)


def test_twin_no_share_uses_down_tree():
    params, state = _init(key=5, weight_share=False)
    assert "down" in params
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 1))
    out, _ = swin_onet_forward(params, state, x, train=False)
    assert bool(jnp.all(jnp.isfinite(out.S)))


def test_gradients_flow_to_every_parameter():
    params, state = _init(key=7)
    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 1))

    def loss_fn(p):
        out, _ = swin_onet_forward(p, state, x, train=True)
        return compute_loss(out)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(path) for path, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not dead, f"zero-gradient leaves: {dead[:5]}"


def test_train_step_integration_and_checkpoint_roundtrip(tmp_path):
    from onet_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_eval_step, make_train_step

    arch = get_arch("swin", swin_window=2, swin_embed=12)
    params, state = arch.init(jax.random.key(9), 1)
    opt = adam_init(params)
    step = make_train_step(forward=arch.forward)
    x = jax.random.uniform(jax.random.key(10), (2, 64, 64, 1))
    params2, state2, opt2, loss = step(params, state, opt, x, 1e-4)
    assert np.isfinite(float(loss))

    path = str(tmp_path / "swin.npz")
    save_checkpoint(path, params2, state2, 0, opt_state=opt2)
    p3, s3, epoch, o3 = load_checkpoint(
        path, params2, state2, opt_template=opt2)
    assert epoch == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p3)[0]),
        np.asarray(jax.tree.leaves(params2)[0]))

    ev = make_eval_step(forward=arch.forward, align="flip")
    labels = jnp.zeros((2, 64, 64), jnp.int32)
    metrics, eloss, pred = ev(p3, s3, x, labels)
    assert np.isfinite(float(eloss))
    assert pred.shape == (2, 64, 64)


def test_vanilla_only_machinery_is_guarded():
    import pytest
    from onet_tpu.train.steps import make_train_step

    arch = get_arch("swin", swin_window=2, swin_embed=12)
    with pytest.raises(ValueError):
        make_train_step(forward=arch.forward, quantized="fwd")
    with pytest.raises(ValueError):
        get_arch("swin").init(jax.random.key(0), 1, base=8)
    with pytest.raises(ValueError):
        get_arch("nope")


def test_unsupervised_learning_smoke():
    """A few steps on toy target-on-clutter frames: the JSD loss must
    decrease (the published objective trains through the transformer
    backbone end to end)."""
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

    arch = get_arch("swin", swin_window=2, swin_embed=12)
    params, state = arch.init(jax.random.key(11), 1)
    opt = adam_init(params)
    step = make_train_step(forward=arch.forward)
    losses = []
    for _ in range(6):
        params, state, opt, loss = step(params, state, opt, xb, 3e-4)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
