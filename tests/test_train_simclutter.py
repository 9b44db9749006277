"""End-to-end slice: device-generated data -> train -> eval -> checkpoint.

Tiny shapes (base=8, 64x64, 12 frames) so the whole loop runs on the 1-core
CPU harness in seconds; the assertions check the loop LEARNS (loss drops,
detection beats chance on easy high-SNR data).
"""

import glob
import os

import numpy as np
import pytest

import jax

from onet_tpu.train.simclutter import SimclutterConfig, train
from onet_tpu.core.checkpoint import load_checkpoint
from onet_tpu.models.onet import onet_init


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt")
    cfg = SimclutterConfig(
        epoch_nums=6, batch_sz=4, input_sz=64, base_channels=8,
        low_snr=8, high_snr=8, frames_per_level=12,
        base_lr=2e-4, eval_every=5, out_root=str(out), save_epochs=(),
    )
    params, bn_state, history = train(cfg, log=False)
    return cfg, params, bn_state, history, out


def test_loss_decreases(run):
    _, _, _, history, _ = run
    losses = history["loss"]
    assert len(losses) == 6
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_eval_metrics_present_and_sane(run):
    _, _, _, history, _ = run
    final = history["eval"][5]
    assert set(final) == {"acc", "miou", "dr", "far", "tiou"}
    assert 0 <= final["acc"] <= 1 and 0 <= final["far"] <= 1


def test_checkpoint_roundtrip(run):
    cfg, params, bn_state, _, out = run
    files = glob.glob(str(out / "*.npz"))
    assert files, "final-epoch checkpoint missing"
    p_t, s_t = onet_init(jax.random.key(0), cfg.in_channels,
                         base=cfg.base_channels)
    p, s, epoch = load_checkpoint(files[0], p_t, s_t)
    assert epoch == cfg.epoch_nums - 1
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(p)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kdist_background_workload():
    """bg="k" drives the full workload on K-distributed clutter (the
    reference's prepare_data(bg_type='k') path, Rayleigh_bg_...:251-275)."""
    import jax

    from onet_tpu.data.simclutter import simclutter_datasets

    tr, te = simclutter_datasets(jax.random.key(0), low_snr=5, high_snr=5,
                                 frames_per_level=6, crop=64, bg="k")
    assert tr["imgs"].shape[1:] == (64, 64, 1)
    assert float(tr["imgs"].min()) >= 0.0 and float(tr["imgs"].max()) <= 1.0
    assert 0.001 < float(tr["labels"].mean()) < 0.2
    # a couple of train steps run
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    params, bn = onet_init(jax.random.key(1), 1, base=8)
    step = make_train_step()
    opt = adam_init(params)
    for i in range(2):
        params, bn, opt, loss = step(params, bn, opt, tr["imgs"][:4], 1e-4)
    assert bool(jax.numpy.isfinite(loss))


def test_equal_split_per_snr():
    """equal_split=True is the reference's equalized-distribution loader
    (make_dataloader_eq_dist_in_snr_range, simbg4onet_20230209.py:242-288):
    every SNR level lands in both splits at exactly train_frac."""
    import jax
    import numpy as np

    from onet_tpu.data.simclutter import simclutter_datasets

    tr, te = simclutter_datasets(jax.random.key(0), low_snr=3, high_snr=5,
                                 frames_per_level=10, crop=32,
                                 equal_split=True)
    for lvl in (3, 4, 5):
        assert int((np.asarray(tr["psnr"]) == lvl).sum()) == 9, lvl
        assert int((np.asarray(te["psnr"]) == lvl).sum()) == 1, lvl
    # the global split has no per-level guarantee; sizes still 90/10
    assert len(tr) == 27 and len(te) == 3
