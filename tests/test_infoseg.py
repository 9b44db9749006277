"""InfoSeg baseline: shapes, pooling math, loss behavior, training sanity.

The reference's InfoSeg module is absent from the snapshot (SURVEY §2.9);
``models/infoseg.py`` re-implements the published method with the
reference's API shape (``(L, S, V)`` forward tuple + ``get_label(V)``,
exp_nau_rain_20240513.py:364-365). These tests pin the pieces that have
closed forms and the end-to-end property that matters: it learns to
detect bright targets in clutter unsupervised.
"""

import jax
import jax.numpy as jnp
import numpy as np

from onet_tpu.data.arrays import ArrayDataset
from onet_tpu.models.infoseg import (
    infoseg_init, infoseg_forward, compute_infoseg_loss, get_label)
from onet_tpu.train.infoseg import InfoSegConfig, train


def _toy_ds(n=60, h=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.rayleigh(0.15, size=(n, h, h)).astype(np.float32)
    labels = np.zeros((n, h, h), np.float32)
    for i in range(n):
        y, x = rng.integers(4, h - 10, 2)
        imgs[i, y:y + 6, x:x + 6] += 1.0
        labels[i, y:y + 6, x:x + 6] = 1
    imgs = imgs / imgs.max(axis=(1, 2), keepdims=True)
    return ArrayDataset({"imgs": jnp.asarray(imgs)[..., None],
                         "labels": jnp.asarray(labels)})


def test_forward_shapes_and_odd_sizes():
    p, s = infoseg_init(jax.random.key(0), 1, 2, base=8)
    x = jax.random.uniform(jax.random.key(1), (3, 33, 31, 1))
    out, ns = infoseg_forward(p, s, x, train=True)
    assert out.logits.shape == (3, 33, 31, 2)
    assert out.scores.shape == (3, 33, 31, 2)
    assert out.probs.shape == (3, 33, 31, 2)
    assert out.glob.shape == (3, 2, 8)
    lab = get_label(out.probs)
    assert lab.shape == (3, 33, 31) and lab.dtype == jnp.int32
    # BN state advanced in train mode
    assert not jnp.allclose(ns["enc1_bn"]["mean"], s["enc1_bn"]["mean"])


def test_global_features_are_assignment_weighted_means():
    p, s = infoseg_init(jax.random.key(0), 1, 2, base=8)
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 1))
    out, _ = infoseg_forward(p, s, x, train=False)
    # recompute G from probs and UNNORMALIZED feats is not exposed; verify
    # instead that each global feature is a convex combination: unit-norm
    # and S = fh . gh / tau consistency
    from onet_tpu.models.infoseg import TAU
    want = jnp.einsum("nhwd,nkd->nhwk", out.feats, out.glob) / TAU
    np.testing.assert_allclose(np.asarray(out.scores), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    norms = jnp.linalg.norm(out.glob, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_loss_prefers_separated_assignments():
    # hand-built features: two images, each with two well-separated
    # clusters -> a confident matching assignment must beat a uniform one
    d = 8
    f = np.zeros((2, 4, 4, d), np.float32)
    f[:, :2, :, 0] = 1.0   # cluster A in rows 0-1
    f[:, 2:, :, 1] = 1.0   # cluster B in rows 2-3
    f = jnp.asarray(f)
    fh = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)

    def mk(probs):
        mass = jnp.sum(probs, axis=(1, 2))
        g = (jnp.einsum("nhwk,nhwd->nkd", probs, f)
             / jnp.maximum(mass, 1e-6)[..., None])
        gh = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                             1e-6)
        from onet_tpu.models.infoseg import InfoSegOut
        return InfoSegOut(probs, probs, probs, fh, gh)

    conf = np.zeros((2, 4, 4, 2), np.float32)
    conf[:, :2, :, 0] = 1.0
    conf[:, 2:, :, 1] = 1.0
    loss_conf = float(compute_infoseg_loss(mk(jnp.asarray(conf))))
    loss_unif = float(compute_infoseg_loss(
        mk(jnp.full((2, 4, 4, 2), 0.5))))
    assert loss_conf < loss_unif


def test_training_learns_to_detect_targets():
    ds = _toy_ds()
    tr, te = ds.select(jnp.arange(50)), ds.select(jnp.arange(50, 60))
    cfg = InfoSegConfig(epoch_nums=25, batch_sz=10, input_sz=32,
                        base_channels=8, eval_every=25, base_lr=3e-4,
                        out_root="/tmp/infoseg_test")
    _, _, hist = train(cfg, datasets=(tr, te), log=False)
    final = hist["eval"][cfg.epoch_nums - 1]
    assert final["dr"] > 0.9, final          # finds the bright targets
    assert final["acc"] > 0.7, final         # without flooding the frame
    assert hist["loss"][-1] < hist["loss"][0]


def test_cli_nau_comparison_surface(tmp_path, capsys, monkeypatch):
    """nau --infoseg/--cfar/--model-tw/--model2/--compare-fig end-to-end:
    every reference revision-figure column (exp_nau_rain_20240513.py:
    177-261,312-533) reported from one command."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.onet import onet_init
    import onet_tpu.data.nau as N

    real = N.synthesize_nau_rain
    monkeypatch.setattr("onet_tpu.data.nau.synthesize_nau_rain",
                        lambda key, n=10, size=200, **kw: real(key, n=4,
                                                               size=64))
    # InfoSeg checkpoint (base must match --base-channels)
    ip, istate = infoseg_init(jax.random.key(0), 1, 2, base=8)
    ick = tmp_path / "infoseg_epoch_0.npz"
    save_checkpoint(str(ick), ip, istate, 0)
    # stage-2 (shared) and twin Onet checkpoints, arch self-described
    p2, bn2 = onet_init(jax.random.key(1), 1, base=8)
    ck2 = tmp_path / "onet2nd_epoch_0.npz"
    save_checkpoint(str(ck2), p2, bn2, 0)
    ptw, bntw = onet_init(jax.random.key(2), 1, base=8,
                          weight_share=False)
    cktw = tmp_path / "onet_tw_epoch_0.npz"
    save_checkpoint(str(cktw), ptw, bntw, 0)

    cli.main(["nau", "--base-channels", "8", "--fp32",
              "--cfar", "2.0", "--infoseg", str(ick),
              "--model2", str(ck2), "--model-tw", str(cktw),
              "--compare-fig", "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    for token in ("InfoSeg baseline", "CA-CFAR baseline", "Onet_TW",
                  "Onet2 two-stage", "comparison figure"):
        assert token in out, (token, out)
    fig = tmp_path / "exp_naurain_method_comparison.png"
    assert fig.exists() and fig.stat().st_size > 10_000
