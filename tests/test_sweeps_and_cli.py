"""Per-SNR sweeps, checkpoint-dir verification, and the CLI surface."""

import os

import numpy as np
import pytest

import jax

from onet_tpu.models.onet import onet_init
from onet_tpu.core.checkpoint import save_checkpoint
from onet_tpu.train.sweeps import per_snr_datasets, verify_checkpoint_dir
from onet_tpu.train.sweeps import test_by_snr as snr_sweep_eval


@pytest.fixture(scope="module")
def tiny_sweep_data():
    return per_snr_datasets(jax.random.key(0), levels=(2, 8),
                            frames_per_level=4, crop=64)


def test_snr_sweep_eval(tiny_sweep_data):
    params, bn = onet_init(jax.random.key(1), 1, base=8)
    report = snr_sweep_eval(params, bn, tiny_sweep_data, batch_sz=2)
    assert set(report) == {2, 8, "ave"}
    assert 0 <= report["ave"]["acc"] <= 1


def test_verify_checkpoint_dir(tiny_sweep_data, tmp_path):
    """Mixed-family directory: each file rebuilds its own model (vanilla
    by shape inference, swin by arch metadata)."""
    from onet_tpu.models.swin import swin_onet_init

    params, bn = onet_init(jax.random.key(2), 1, base=8)
    save_checkpoint(str(tmp_path / "m_epoch_5.npz"), params, bn, 5)
    sp, ss = swin_onet_init(jax.random.key(3), 1, window=2, embed_dim=12)
    save_checkpoint(str(tmp_path / "sw_epoch_7.npz"), sp, ss, 7,
                    meta={"arch": "swin", "swin_window": 2,
                          "swin_embed": 12, "in_channels": 1,
                          "weight_share": True})
    # a reference-schema torch file verifies alongside (the reference's
    # glob was *.pytorch)
    from onet_tpu.core.torch_import import export_torch_checkpoint
    export_torch_checkpoint(str(tmp_path / "ref_epoch300.pytorch"),
                            params, bn, epoch=300)
    report = verify_checkpoint_dir(str(tmp_path),
                                   datasets_by_psnr=tiny_sweep_data,
                                   batch_sz=2)
    assert report["m_epoch_5.npz"]["epoch"] == 5
    assert report["m_epoch_5.npz"]["arch"] == "vanilla"
    assert "ave" in report["m_epoch_5.npz"]["per_snr"]
    assert report["sw_epoch_7.npz"]["arch"] == "swin"
    assert 0 <= report["sw_epoch_7.npz"]["per_snr"]["ave"]["acc"] <= 1
    assert report["ref_epoch300.pytorch"]["arch"] == "vanilla"
    assert report["ref_epoch300.pytorch"]["epoch"] == 300


def test_cli_sweep_model_dir(tiny_sweep_data, tmp_path, capsys, monkeypatch):
    """`run sweep --model-dir` = the reference's test_model_performance
    glob as a CLI; each checkpoint rebuilds its own model."""
    from onet_tpu import run as cli
    from onet_tpu.models.swin import swin_onet_init

    params, bn = onet_init(jax.random.key(2), 1, base=8)
    save_checkpoint(str(tmp_path / "van_epoch_5.npz"), params, bn, 5)
    sp, ss = swin_onet_init(jax.random.key(3), 1, window=2, embed_dim=12)
    save_checkpoint(str(tmp_path / "sw_epoch_7.npz"), sp, ss, 7,
                    meta={"arch": "swin", "swin_window": 2,
                          "swin_embed": 12, "in_channels": 1,
                          "weight_share": True})
    monkeypatch.setattr("onet_tpu.train.sweeps.per_snr_datasets",
                        lambda key, frames_per_level=150: tiny_sweep_data)
    cli.main(["sweep", "--model-dir", str(tmp_path), "--fp32"])
    out = capsys.readouterr().out
    assert "van_epoch_5.npz (epoch 5, arch vanilla): ave_acc:" in out
    assert "sw_epoch_7.npz (epoch 7, arch swin): ave_acc:" in out


def test_cli_gen_data(tmp_path, monkeypatch):
    from onet_tpu import run as cli
    out = tmp_path / "tiny.npz"
    # shrink the generator via monkeypatching the dataset call
    import onet_tpu.sim.rayleigh as R

    original = R.generate_rayleigh_dataset

    def tiny_gen(key, bg="rayleigh", **_cli_kwargs):
        # the CLI forwards --levels/--frames-per-level/--crop; the tiny
        # override wins so the test stays fast
        return original(key, levels=(5,), frames_per_level=2, crop=64,
                        bg=bg)

    monkeypatch.setattr("onet_tpu.sim.rayleigh.generate_rayleigh_dataset",
                        tiny_gen)
    cli.main(["gen-data", "--out", str(out)])
    with np.load(out) as z:
        assert z["imgs"].shape == (2, 64, 64, 1)
        assert z["psnr"].tolist() == [5, 5]


def test_cli_nau_synthetic(capsys, monkeypatch):
    from onet_tpu import run as cli
    import onet_tpu.data.nau as N

    real = N.synthesize_nau_rain

    def tiny(key, n=10, size=200, **kw):
        return real(key, n=4, size=64)

    monkeypatch.setattr("onet_tpu.data.nau.synthesize_nau_rain", tiny)
    cli.main(["nau", "--base-channels", "8", "--fp32"])
    out = capsys.readouterr().out
    assert "'acc'" in out


def test_cli_serve_bf16_and_int8(tmp_path, capsys):
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.onet import onet_init

    params, bn = onet_init(jax.random.key(4), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    imgs = np.random.default_rng(0).uniform(
        0, 1, (6, 32, 32, 1)).astype(np.float32)
    inp = tmp_path / "frames.npz"
    np.savez(inp, imgs=imgs)
    for flag in ([], ["--int8"]):
        out = tmp_path / f"masks{len(flag)}.npz"
        cli.main(["serve", "--model", str(ck), "--input", str(inp),
                  "--out", str(out), "--base-channels", "8",
                  "--serve-batch", "3"] + flag)
        with np.load(out) as z:
            assert z["masks"].shape == (6, 32, 32)
            assert set(np.unique(z["masks"])) <= {0, 1}
    assert "[serve:int8]" in capsys.readouterr().out


def test_cli_serve_tiled_scene(tmp_path, capsys):
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.onet import onet_init

    params, bn = onet_init(jax.random.key(4), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    imgs = np.random.default_rng(1).uniform(
        0, 1, (2, 80, 96, 1)).astype(np.float32)
    np.savez(tmp_path / "scenes.npz", imgs=imgs)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "scenes.npz"), "--out", str(out),
              "--base-channels", "8", "--serve-batch", "2",
              "--tile", "48", "--halo", "16"])
    with np.load(out) as z:
        assert z["masks"].shape == (2, 80, 96)


def test_cli_zy3_cloud_addition(tmp_path, capsys, monkeypatch):
    """The cloud-addition composite dataset drives a LIVE training run
    (reference CloudDataset_CloudAddition had no consumer until round 3):
    2 epochs on tiny composites, eval against the known synthetic masks."""
    from onet_tpu import run as cli
    import onet_tpu.data.zy3 as Z

    real = Z.synthesize_cloud_addition

    def tiny(key, n=8, size=224, **kw):
        return real(key, n=min(n, 6), size=32)

    monkeypatch.setattr("onet_tpu.data.zy3.synthesize_cloud_addition", tiny)
    cli.main(["zy3", "--cloud-addition", "--epochs", "2", "--batch-sz", "3",
              "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "cloud-addition composites" in out
    assert "report:" in out          # the xlsx report path printed
    assert "cloudadd" in out or os.path.exists(str(tmp_path))


def test_cli_zy3_dp_mesh(tmp_path, capsys, monkeypatch):
    """zy3 --dp N trains data-parallel on the virtual mesh from the CLI
    (all training workloads scale from the product surface)."""
    from onet_tpu import run as cli
    import onet_tpu.data.zy3 as Z

    real = Z.synthesize_zy3
    monkeypatch.setattr(
        "onet_tpu.data.zy3.synthesize_zy3",
        lambda key, n=16, **kw: real(key, n=8, size=32))
    cli.main(["zy3", "--epochs", "2", "--batch-sz", "4", "--dp", "4",
              "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "data-parallel over 4 devices" in out
    assert "===Epoch" in out


def test_cli_zy3_restart_from(tmp_path, capsys, monkeypatch):
    """`zy3 --restart-from ck` continues the reference's restart
    semantics (Train_Onet_on_zy3_20240606.py:77-82): epoch numbering
    resumes after the checkpoint's epoch."""
    import glob

    from onet_tpu import run as cli
    import onet_tpu.data.zy3 as Z

    real = Z.synthesize_zy3
    monkeypatch.setattr(
        "onet_tpu.data.zy3.synthesize_zy3",
        lambda key, n=16, **kw: real(key, n=6, size=32))
    cli.main(["zy3", "--epochs", "2", "--batch-sz", "3",
              "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    ck = glob.glob(os.path.join(str(tmp_path), "*epoch1*.npz"))
    assert ck, "first run saved no final checkpoint"
    capsys.readouterr()
    cli.main(["zy3", "--epochs", "4", "--batch-sz", "3",
              "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path), "--restart-from", ck[0]])
    out = capsys.readouterr().out
    assert "Epoch: 0002" in out and "Epoch: 0003" in out
    assert "Epoch: 0000" not in out    # did NOT retrain from scratch


def test_cli_simclutter_resume_flag(tmp_path, capsys, monkeypatch):
    """`simclutter --resume` auto-resumes from the newest checkpoint
    under out_root (and the YAML's reference-schema `restart:` key maps
    to the same surface)."""
    import glob

    import onet_tpu.data.simclutter as S
    from onet_tpu import run as cli
    from onet_tpu.data.arrays import ArrayDataset

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})
    monkeypatch.setattr(S, "simclutter_datasets",
                        lambda *a, **kw: (ds, ds))
    monkeypatch.setattr("onet_tpu.train.simclutter.simclutter_datasets",
                        lambda *a, **kw: (ds, ds))
    base = ["simclutter", "--batch-sz", "4", "--base-channels", "8",
            "--fp32", "--out-root", str(tmp_path)]
    cli.main(base + ["--epochs", "2"])
    assert glob.glob(os.path.join(str(tmp_path), "*epoch_1*.npz"))
    cli.main(base + ["--epochs", "4", "--resume"])
    assert "resume: newest checkpoint" in capsys.readouterr().out
    # the resumed run logged its resume point into the run log
    logs = glob.glob(os.path.join(str(tmp_path), "*.log"))
    assert any("Resumed from" in open(p).read() for p in logs), logs


def test_cli_serve_detector_far_budget(tmp_path, capsys):
    """serve --far-budget emits THRESHOLDED detection masks with the
    calibrated threshold stored next to the checkpoint (the low-SNR
    detector uplift as a product path, VERDICT r2 item 6)."""
    import json
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "frames.npz"), "--out", str(out),
              "--base-channels", "8", "--fp32", "--serve-batch", "4",
              "--far-budget", "0.05"])
    txt = capsys.readouterr().out
    assert "calibrated detector threshold" in txt
    sidecar = str(ck) + ".detector.json"
    assert os.path.exists(sidecar)
    d = json.load(open(sidecar))
    assert d["far_budget"] == 0.05
    masks = np.load(out)["masks"]
    assert masks.shape == (4, 32, 32)
    # calibration batch = the input: the positive fraction matches the
    # budget (quantile semantics, sparse-target approximation)
    frac = masks.mean()
    assert 0.0 < frac < 0.15, frac
    # sidecar reuse path
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "frames.npz"), "--out", str(out),
              "--base-channels", "8", "--fp32", "--serve-batch", "4",
              "--far-budget", "0.05"])
    assert "from" in capsys.readouterr().out


def test_cli_serve_tiled_2048_scene_agrees_with_whole(tmp_path, capsys):
    """Production-scale tiled serving e2e: ONE 2048^2 scene through
    `serve --tile`, with the interior of the tiled mask agreeing with
    whole-scene inference (VERDICT r2 item 9). Small net (base=8) keeps
    the CPU cost bounded; the tiling geometry is the thing under test."""
    import jax.numpy as jnp
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.infer import fold_onet, onet_infer
    from onet_tpu.models.onet import onet_init

    params, bn = onet_init(jax.random.key(4), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    rng = np.random.default_rng(2)
    scene = rng.uniform(0, 1, (1, 2048, 2048, 1)).astype(np.float32)
    scene[:, 900:1000, 900:1000] = np.clip(
        scene[:, 900:1000, 900:1000] + 0.8, 0, 1)   # a bright target
    np.savez(tmp_path / "scene.npz", imgs=scene)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "scene.npz"), "--out", str(out),
              "--base-channels", "8", "--serve-batch", "4",
              "--tile", "512", "--halo", "32"])
    txt = capsys.readouterr().out
    assert "serve:" in txt
    tiled = np.load(out)["masks"][0]
    assert tiled.shape == (2048, 2048)

    folded = fold_onet(params, bn)
    _, whole = onet_infer(folded, jnp.asarray(scene))
    whole = np.asarray(whole[0])
    # interior agreement (window interiors see >= halo pixels of true
    # context; only long-range context beyond the halo can differ)
    inner = np.s_[64:-64, 64:-64]
    agree = float(np.mean(tiled[inner] == whole[inner]))
    assert agree >= 0.99, agree


def test_cli_simclutter_dp_mesh(tmp_path, capsys, monkeypatch):
    """simclutter --dp N trains data-parallel on the virtual mesh through
    the CLI (multi-chip as a product surface, not only a test fixture)."""
    from onet_tpu import run as cli
    import onet_tpu.data.simclutter as S

    real = S.simclutter_datasets

    def tiny(key, **kw):
        kw.update(frames_per_level=6, crop=32)
        return real(key, low_snr=kw.pop("low_snr", 0),
                    high_snr=kw.pop("high_snr", 2), **kw)

    monkeypatch.setattr("onet_tpu.train.simclutter.simclutter_datasets",
                        tiny)
    cli.main(["simclutter", "--epochs", "2", "--batch-sz", "4", "--dp", "4",
              "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "data-parallel over 4 devices" in out
    assert "===Epoch" in out


def test_cli_simclutter_pp_mesh(tmp_path, capsys, monkeypatch):
    """simclutter --pp M trains through the GPipe pipeline on a
    (data x stage) mesh from the CLI, composing with --dp."""
    from onet_tpu import run as cli
    import onet_tpu.data.simclutter as S

    real = S.simclutter_datasets

    def tiny(key, **kw):
        kw.update(frames_per_level=6, crop=32)
        return real(key, low_snr=kw.pop("low_snr", 0),
                    high_snr=kw.pop("high_snr", 2), **kw)

    monkeypatch.setattr("onet_tpu.train.simclutter.simclutter_datasets",
                        tiny)
    cli.main(["simclutter", "--epochs", "2", "--batch-sz", "4",
              "--pp", "2", "--dp", "2", "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "pipeline over 4 devices (data=2 x stage=2, 2 microbatches)" \
        in out
    assert "===Epoch" in out


def test_cli_simclutter_sp_2d_mesh(tmp_path, capsys, monkeypatch):
    """simclutter --sp RxC trains through the exact halo-exchange step on a
    (data x space x spacew) 2-D spatial mesh from the CLI, composing with
    --dp — all four parallel axes are now product surfaces."""
    from onet_tpu import run as cli
    import onet_tpu.data.simclutter as S

    real = S.simclutter_datasets

    def tiny(key, **kw):
        kw.update(frames_per_level=6, crop=32)
        return real(key, low_snr=kw.pop("low_snr", 0),
                    high_snr=kw.pop("high_snr", 2), **kw)

    monkeypatch.setattr("onet_tpu.train.simclutter.simclutter_datasets",
                        tiny)
    cli.main(["simclutter", "--epochs", "2", "--batch-sz", "4",
              "--sp", "2x2", "--dp", "2", "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert ("spatial halo-exchange training over 8 devices "
            "(data=2 x space=2 x spacew=2)") in out
    assert "===Epoch" in out


def test_cli_simclutter_sp_rows_only(tmp_path, capsys, monkeypatch):
    """--sp R (no xC) shards rows only on a ('data','space') mesh."""
    from onet_tpu import run as cli
    import onet_tpu.data.simclutter as S

    real = S.simclutter_datasets

    def tiny(key, **kw):
        kw.update(frames_per_level=6, crop=32)
        return real(key, low_snr=kw.pop("low_snr", 0),
                    high_snr=kw.pop("high_snr", 2), **kw)

    monkeypatch.setattr("onet_tpu.train.simclutter.simclutter_datasets",
                        tiny)
    cli.main(["simclutter", "--epochs", "1", "--batch-sz", "4",
              "--sp", "2", "--base-channels", "8", "--fp32",
              "--out-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert ("spatial halo-exchange training over 2 devices "
            "(data=1 x space=2)") in out
    assert "===Epoch" in out


def test_cli_summary(capsys):
    from onet_tpu import run as cli
    cli.main(["summary", "--base-channels", "8", "--input-sz", "64"])
    out = capsys.readouterr().out
    assert "params:" in out and "TOTAL" in out
    assert "traced graph: 44 layer ops" in out


def test_cli_serve_detector_with_tiling(tmp_path, capsys):
    """--far-budget combined with --tile: the calibration runs on
    window-sized center crops (never compiles the untiled graph at scene
    size) and the tiled masks are thresholded detections."""
    import json
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    scenes = np.random.default_rng(0).uniform(
        0, 1, (2, 120, 120, 1)).astype(np.float32)
    np.savez(tmp_path / "scenes.npz", imgs=scenes)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "scenes.npz"), "--out", str(out),
              "--base-channels", "8", "--fp32", "--serve-batch", "2",
              "--tile", "48", "--halo", "16", "--far-budget", "0.05"])
    txt = capsys.readouterr().out
    assert "calibrated detector threshold" in txt
    masks = np.load(out)["masks"]
    assert masks.shape == (2, 120, 120)
    assert 0.0 <= masks.mean() < 0.2


def test_cli_serve_rgb_checkpoint(tmp_path, capsys):
    """serve --in-channels 3 loads and serves a ZY-3-class RGB checkpoint
    (serve previously hardcoded 1 input channel)."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = onet_init(jax.random.key(0), 3, base=8)
    ck = tmp_path / "rgb_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    imgs = np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    out = tmp_path / "masks.npz"
    cli.main(["serve", "--model", str(ck), "--in-channels", "3",
              "--input", str(tmp_path / "frames.npz"), "--out", str(out),
              "--base-channels", "8", "--fp32", "--serve-batch", "2"])
    assert np.load(out)["masks"].shape == (2, 32, 32)


def test_parse_sp_validation():
    """--sp accepts R / RxC and rejects malformed specs with SystemExit
    (not a raw ValueError traceback) — advisor round-3 finding."""
    from onet_tpu.run import _parse_sp

    assert _parse_sp("2") == (2, 1)
    assert _parse_sp("2x") == (2, 1)
    assert _parse_sp("2x4") == (2, 4)
    for bad in ("two", "2x2x2", "0x3", "", "x2", "-1"):
        with pytest.raises(SystemExit):
            _parse_sp(bad)


def test_cli_gen_data_zy3_ts(tmp_path):
    """gen-data --workload zy3 --out x.ts writes a real tilestore (it
    previously wrote npz bytes under a .ts name) — advisor round-3
    finding."""
    from onet_tpu import run as cli
    from onet_tpu.data.tilestore import load_store

    out = tmp_path / "zy3.ts"
    cli.main(["gen-data", "--workload", "zy3", "--n", "2",
              "--out", str(out)])
    d = load_store(str(out))
    assert d["imgs"].shape[0] == 2 and d["labels"].shape[0] == 2


def test_wp_rblk_env_is_lazy_and_validated(monkeypatch):
    """ONET_WP_RBLK is parsed at first kernel use, not import, and
    rejects non-integers / non-powers-of-two / oversized blocks with a
    clear message — advisor round-3 finding."""
    from onet_tpu.ops import pallas_conv as pc

    monkeypatch.setattr(pc, "_RBLK_CACHE", [])
    monkeypatch.setenv("ONET_WP_RBLK", "banana")
    with pytest.raises(ValueError, match="not an integer"):
        pc._rblk()
    monkeypatch.setenv("ONET_WP_RBLK", "48")
    with pytest.raises(ValueError, match="power of two"):
        pc._rblk()
    monkeypatch.setenv("ONET_WP_RBLK", "128")
    with pytest.raises(ValueError, match="power of two"):
        pc._rblk()
    monkeypatch.setenv("ONET_WP_RBLK", "32")
    assert pc._rblk() == 32
    assert pc._rblk() == 32   # cached
