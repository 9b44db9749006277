"""One user journey, chained end to end at tiny sizes.

train (simclutter driver, autosaves on) -> verify the checkpoint
directory from the CLI (mixed with a torch export) -> serve the trained
model with the threshold detector, reusing the calibrated sidecar.
Every piece has its own unit/e2e test; this chains them the way a user
actually moves, so surface contracts (file naming, metadata, sidecars)
cannot drift apart unnoticed.
"""

import glob
import os

import numpy as np

from onet_tpu.data.arrays import ArrayDataset


def test_train_verify_serve_chain(tmp_path, capsys, monkeypatch):
    from onet_tpu import run as cli
    from onet_tpu.train.simclutter import SimclutterConfig, train

    # --- train: 2 epochs, tiny model, autosaves + milestone ---
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})
    out_root = str(tmp_path / "out")
    cfg = SimclutterConfig(epoch_nums=2, batch_sz=4, base_channels=8,
                           out_root=out_root, model_name="j",
                           eval_every=5, save_epochs=(), autosave_every=1,
                           autosave_keep=2)
    train(cfg, datasets=(ds, ds), log=False)
    final = glob.glob(os.path.join(out_root, "j_epoch_*.npz"))
    assert final, "driver saved no final checkpoint"

    # --- export one torch copy into the same dir (the reference's glob
    # format) and verify the whole directory from the CLI ---
    cli.main(["export-torch", "--model", final[0],
              "--out", os.path.join(out_root, "j_ref.pytorch")])
    tiny_levels = {5: ds}
    monkeypatch.setattr(
        "onet_tpu.train.sweeps.per_snr_datasets",
        lambda key, frames_per_level=150: tiny_levels)
    cli.main(["sweep", "--model-dir", out_root, "--fp32"])
    out = capsys.readouterr().out
    # epoch-0 autosave + final milestone + the torch export: one row each
    assert out.count("arch vanilla") == 3
    assert "j_ref.pytorch" in out

    # --- serve the trained model with the detector; sidecar reused ---
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    for _ in range(2):
        cli.main(["serve", "--model", final[0],
                  "--input", str(tmp_path / "frames.npz"),
                  "--out", str(tmp_path / "det.npz"),
                  "--far-budget", "0.05", "--fp32", "--serve-batch", "4"])
    out = capsys.readouterr().out
    assert "calibrated detector threshold" in out   # first call writes
    assert "from " in out                           # second call reuses
    assert os.path.exists(final[0] + ".detector.json")
    with np.load(tmp_path / "det.npz") as z:
        masks = z["masks"]
        assert masks.shape == (8, 32, 32)
        # far budget respected on the calibration distribution (loose 2x)
        assert masks.mean() <= 2 * 0.05 + labels.mean()

    # --- deploy: export the trained model as an AOT artifact and serve
    # it with zero model code; masks match checkpoint serving exactly ---
    cli.main(["export-artifact", "--model", final[0], "--input-sz", "32",
              "--platforms", "cpu", "--fp32"])
    art = os.path.splitext(final[0])[0] + ".onetx"
    assert os.path.exists(art)
    for tag, model in (("ck", final[0]), ("art", art)):
        cli.main(["serve", "--model", model,
                  "--input", str(tmp_path / "frames.npz"),
                  "--out", str(tmp_path / f"dep_{tag}.npz"),
                  "--fp32", "--serve-batch", "4"])
    np.testing.assert_array_equal(
        np.load(tmp_path / "dep_ck.npz")["masks"],
        np.load(tmp_path / "dep_art.npz")["masks"])
