"""Serving ablation-family checkpoints by metadata auto-detection.

Train-driver checkpoints carry an '__meta__' arch record
(core/checkpoint.py::save_checkpoint, models/arch.py::arch_meta); `run
serve` rebuilds the right backbone from it with no flag bookkeeping.
Meta-less npz files and torch imports stay on the vanilla path, and int8
(a folded-conv-only surface) refuses non-vanilla checkpoints clearly.
"""

import numpy as np
import pytest

import jax

from onet_tpu.core.checkpoint import (read_checkpoint_meta, save_checkpoint)
from onet_tpu.models.arch import arch_from_meta, arch_meta, get_arch


def _swin_ck(tmp_path):
    from onet_tpu.models.swin import swin_onet_init
    params, state = swin_onet_init(jax.random.key(0), 1, window=2,
                                   embed_dim=12)
    ck = tmp_path / "swin_epoch_1.npz"
    meta = {"arch": "swin", "swin_window": 2, "swin_embed": 12,
            "in_channels": 1, "weight_share": True}
    save_checkpoint(str(ck), params, state, 1, meta=meta)
    return ck


def test_meta_roundtrip_and_arch_rebuild(tmp_path):
    ck = _swin_ck(tmp_path)
    meta = read_checkpoint_meta(str(ck))
    assert meta["arch"] == "swin" and meta["swin_embed"] == 12
    arch = arch_from_meta(meta)
    assert arch.name == "swin" and not arch.vanilla
    # meta-less checkpoints resolve to vanilla
    assert arch_from_meta({}).vanilla


def test_arch_meta_from_driver_config():
    from onet_tpu.train.simclutter import SimclutterConfig
    m = arch_meta(SimclutterConfig(arch="transunet", transunet_embed=96,
                                   transunet_depth=2))
    assert m == {"arch": "transunet", "in_channels": 1,
                 "weight_share": True, "transunet_embed": 96,
                 "transunet_depth": 2}
    v = arch_meta(SimclutterConfig(base_channels=8))
    assert v["arch"] == "vanilla" and v["base_channels"] == 8


def test_cli_serve_swin_checkpoint(tmp_path, capsys):
    from onet_tpu import run as cli

    ck = _swin_ck(tmp_path)
    imgs = np.random.default_rng(0).uniform(
        0, 1, (4, 64, 64, 1)).astype(np.float32)
    inp = tmp_path / "frames.npz"
    np.savez(inp, imgs=imgs)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--input", str(inp),
              "--out", str(out), "--fp32", "--serve-batch", "2"])
    with np.load(out) as z:
        assert z["masks"].shape == (4, 64, 64)
        assert set(np.unique(z["masks"])) <= {0, 1}
    assert "arch swin from checkpoint metadata" in capsys.readouterr().out


def test_cli_serve_swin_rejects_int8(tmp_path):
    from onet_tpu import run as cli

    ck = _swin_ck(tmp_path)
    with pytest.raises(SystemExit, match="arch swin"):
        cli.main(["serve", "--model", str(ck), "--int8",
                  "--out", str(tmp_path / "m.npz")])


def test_load_arch_auto(tmp_path):
    """One-call loader: swin via metadata, vanilla via shape inference."""
    from onet_tpu.core.checkpoint import load_arch_auto
    from onet_tpu.models.onet import onet_init

    arch, p, s, e = load_arch_auto(str(_swin_ck(tmp_path)))
    assert arch.name == "swin" and e == 1

    vp, vs = onet_init(jax.random.key(1), 3, base=8)
    vk = tmp_path / "v_epoch_2.npz"
    save_checkpoint(str(vk), vp, vs, 2)
    arch, p, s, e = load_arch_auto(str(vk))
    assert arch.vanilla and e == 2
    assert p["top"]["inc"]["conv1"]["w"].shape == (3, 3, 3, 8)


def test_cli_nau_swin_checkpoint(tmp_path, capsys):
    """`run nau --model <swin ckpt>` rebuilds the backbone from metadata
    and runs the transfer eval end to end (64^2 radar fixture — swin
    needs sides divisible by 32)."""
    import torch

    from onet_tpu import run as cli

    ck = _swin_ck(tmp_path)
    rng = np.random.default_rng(1)
    d = {}
    for i in range(4):
        img = rng.rayleigh(1.0, (64, 64)).astype(np.float32)
        lab = (rng.uniform(size=(64, 64)) > 0.8).astype(np.float32)
        d[f"nau_{i}"] = {"img": torch.from_numpy(img),
                         "label": torch.from_numpy(lab)}
    pt = tmp_path / "naurain_fixture.pt"
    torch.save(d, pt)
    cli.main(["nau", "--model", str(ck), "--test-file", str(pt),
              "--out-root", str(tmp_path), "--fp32"])
    out = capsys.readouterr().out
    assert "arch swin" in out and "'acc':" in out


def test_driver_checkpoints_carry_meta(tmp_path):
    """The simclutter driver stamps its checkpoints with the arch record."""
    from onet_tpu.data.arrays import ArrayDataset
    from onet_tpu.train.simclutter import SimclutterConfig, train

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})
    cfg = SimclutterConfig(epoch_nums=1, batch_sz=4, base_channels=8,
                           out_root=str(tmp_path), model_name="meta_probe",
                           eval_every=5, save_epochs=())
    train(cfg, datasets=(ds, ds), log=False)
    import glob
    cks = glob.glob(str(tmp_path / "meta_probe_epoch_*.npz"))
    assert cks, "driver saved no final checkpoint"
    meta = read_checkpoint_meta(cks[0])
    assert meta["arch"] == "vanilla" and meta["base_channels"] == 8
