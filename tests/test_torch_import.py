"""Importing reference torch checkpoints (core/torch_import.py).

The reference ships trained models as ``torch.save({"net": state_dict,
"epoch": N})`` files (Train_Onet_on_simclutter_20250407.py:265-266,
Train_Onet_on_zy3_20240606.py:145-149 uses "save_epoch"). These tests
synthesize checkpoints with the reference's exact state_dict key schema
(Onet_vanilla_20240606.py module naming) from the torch oracle and check:
the imported JAX model reproduces the torch forward, twin/shared
detection, both epoch-key schemas, transparent ``.pt`` loading through
``load_checkpoint``, and the ``import-torch`` CLI round trip.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from onet_tpu.models import onet_forward, onet_init, predict_label
from onet_tpu.core.torch_import import (import_torch_checkpoint,
                                        import_torch_state)
from tests.torch_mirror import MirrorOnet

BASE = 8
HW = 32


def reference_state_dict(mirror: MirrorOnet):
    """Re-key the oracle's state_dict to the reference module names
    (topu.inc.double_conv.0.weight, topu.down1.maxpool_conv.1.double_conv...,
    topu.up1.up.weight, topu.up1.conv.double_conv...)."""
    out = {}
    for prefix, unet in (("topu", mirror.topu), ("dwnu", mirror.dwnu)):
        for j, m in enumerate(unet.inc):
            for k, v in m.state_dict().items():
                out[f"{prefix}.inc.double_conv.{j}.{k}"] = v
        for i in range(4):
            for j, m in enumerate(unet.downs[i][1]):
                for k, v in m.state_dict().items():
                    out[f"{prefix}.down{i + 1}.maxpool_conv.1."
                        f"double_conv.{j}.{k}"] = v
            for k, v in unet.ups_t[i].state_dict().items():
                out[f"{prefix}.up{i + 1}.up.{k}"] = v
            for j, m in enumerate(unet.ups_c[i]):
                for k, v in m.state_dict().items():
                    out[f"{prefix}.up{i + 1}.conv.double_conv.{j}.{k}"] = v
    return out


@pytest.fixture(scope="module")
def shared_ckpt_and_mirror(tmp_path_factory):
    torch.manual_seed(1981)
    mirror = MirrorOnet(cin=1, base=BASE, share=True)
    path = tmp_path_factory.mktemp("torch_import") / "m_epoch_301.pytorch"
    torch.save({"net": reference_state_dict(mirror), "epoch": 301},
               str(path))
    return str(path), mirror


def test_import_forward_parity(shared_ckpt_and_mirror):
    path, mirror = shared_ckpt_and_mirror
    params, state, epoch = import_torch_checkpoint(path)
    assert epoch == 301
    assert "down" not in params          # shared aliases detected

    x = np.random.default_rng(7).uniform(
        0, 1, (2, 1, HW, HW)).astype(np.float32)
    mirror.eval()
    with torch.no_grad():
        lt, vt, ld, vd, s = mirror(torch.from_numpy(x))
    out, _ = onet_forward(params, state,
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out.Vt), vt[:, 0].numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.S[..., 0]), s[:, 0].numpy(),
                               atol=1e-4)
    agree = np.mean(np.asarray(predict_label(out.S))
                    == s.argmax(dim=1).numpy())
    assert agree >= 0.99


def test_twin_detection_and_save_epoch(tmp_path):
    torch.manual_seed(3)
    mirror = MirrorOnet(cin=1, base=BASE, share=False)
    path = tmp_path / "twin.pt"
    torch.save({"net": reference_state_dict(mirror), "save_epoch": 42},
               str(path))
    params, state, epoch = import_torch_checkpoint(str(path))
    assert epoch == 42
    assert "down" in params              # independent dwnu values
    assert not np.array_equal(
        np.asarray(params["top"]["inc"]["conv1"]["w"]),
        np.asarray(params["down"]["inc"]["conv1"]["w"]))


def test_bare_state_dict_and_bad_input(tmp_path):
    torch.manual_seed(4)
    mirror = MirrorOnet(cin=1, base=BASE, share=True)
    path = tmp_path / "bare.pth"
    torch.save(reference_state_dict(mirror), str(path))
    params, state, epoch = import_torch_checkpoint(str(path))
    assert epoch == 0 and "top" in params

    with pytest.raises(KeyError, match="topu"):
        import_torch_state({"not_onet.weight": torch.zeros(1)})
    torch.save([1, 2, 3], str(tmp_path / "junk.pt"))
    with pytest.raises(ValueError, match="state_dict"):
        import_torch_checkpoint(str(tmp_path / "junk.pt"))


def test_load_checkpoint_transparent_pt(shared_ckpt_and_mirror):
    from onet_tpu.core.checkpoint import load_checkpoint
    path, _ = shared_ckpt_and_mirror
    tmpl_p, tmpl_s = onet_init(jax.random.key(0), 1, base=BASE)
    params, bn, epoch = load_checkpoint(path, tmpl_p, tmpl_s)
    assert epoch == 301
    assert params["top"]["inc"]["conv1"]["w"].shape == (3, 3, 1, BASE)

    # wrong template width -> actionable error, not a deep shape crash
    wrong_p, wrong_s = onet_init(jax.random.key(0), 1, base=BASE * 2)
    with pytest.raises(ValueError, match="base-channels"):
        load_checkpoint(path, wrong_p, wrong_s)

    # optimizer-state variant returns None opt_state for torch files
    import optax
    opt_tmpl = optax.adam(1e-3).init(tmpl_p)
    *_, opt = load_checkpoint(path, tmpl_p, tmpl_s, opt_tmpl)
    assert opt is None


def _tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_import_roundtrip():
    from onet_tpu.core.torch_import import export_torch_state
    for share in (True, False):
        params, bn = onet_init(jax.random.key(9), 1, base=BASE,
                               weight_share=share)
        sd = export_torch_state(params, bn)
        p2, s2 = import_torch_state(sd)
        assert ("down" in p2) == (not share)
        _tree_equal(params, p2)
        _tree_equal(bn, s2)


def test_export_key_schema_matches_reference():
    """The exported state_dict must carry EXACTLY the reference model's
    key set (incl. num_batches_tracked), so the reference's strict
    load_state_dict accepts it."""
    from onet_tpu.core.torch_import import export_torch_state
    params, bn = onet_init(jax.random.key(10), 1, base=BASE)
    exported = set(export_torch_state(params, bn))
    torch.manual_seed(0)
    expected = set(reference_state_dict(MirrorOnet(cin=1, base=BASE,
                                                   share=True)))
    assert exported == expected


def test_cli_export_then_reimport(tmp_path, capsys):
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint, load_checkpoint
    params, bn = onet_init(jax.random.key(11), 2, base=BASE)
    ck = tmp_path / "m_epoch_7.npz"
    save_checkpoint(str(ck), params, bn, 7)
    cli.main(["export-torch", "--model", str(ck)])
    out = capsys.readouterr().out
    assert "in_channels 2" in out and "epoch 7" in out
    pt = tmp_path / "m_epoch_7.pytorch"
    assert pt.exists()
    p2, s2, epoch = load_checkpoint(str(pt), *onet_init(
        jax.random.key(0), 2, base=BASE))
    assert epoch == 7
    _tree_equal(params, p2)
    _tree_equal(bn, s2)


def test_cli_import_torch_then_serve(shared_ckpt_and_mirror, tmp_path,
                                     capsys):
    from onet_tpu import run as cli
    path, _ = shared_ckpt_and_mirror
    out = tmp_path / "imported_epoch_301.npz"
    cli.main(["import-torch", "--pt", path, "--out", str(out)])
    assert "epoch 301" in capsys.readouterr().out
    assert out.exists()

    imgs = np.random.default_rng(0).uniform(
        0, 1, (2, HW, HW, 1)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    # serve straight off the torch file (transparent .pt path), then off
    # the converted npz; masks must agree.
    masks = {}
    for tag, model in (("pt", path), ("npz", str(out))):
        dst = tmp_path / f"masks_{tag}.npz"
        cli.main(["serve", "--model", model, "--input",
                  str(tmp_path / "frames.npz"), "--out", str(dst),
                  "--base-channels", str(BASE), "--fp32",
                  "--serve-batch", "2"])
        masks[tag] = np.load(dst)["masks"]
    np.testing.assert_array_equal(masks["pt"], masks["npz"])
