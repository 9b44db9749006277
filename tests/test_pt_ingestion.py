"""Round-trip the reference .pt file formats through every ingestion path.

Fixture dicts are built with torch in the exact schemas the reference
writes/reads:
* zy3:        {img_id: {'true_color': [3,H,W] float tensor, 'mask': [H,W]}}
              (dataloader/zy3_cloud_thumbnailv5_20240304.py:80-106)
* nau:        {name: {'img': [H,W] tensor, 'label': [H,W]}}
              (dataloader/nau_rain_20230523.py:12-38)
* simclutter: {'rayleigh_imgs': [N,1,H,W], 'rayleigh_labels': [N,H,W],
              'psnr': list}  (dataloader/simbg4onet_20230209.py:106-112,
              written by Rayleigh_bg_Gaussian_EOT_generator_20230208.py:295-325)

Each loader is exercised plus one CLI end-to-end per workload on the tiny
fixtures (CPU backend via conftest).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from onet_tpu.data.zy3 import load_zy3_dict_pt
from onet_tpu.data.nau import load_nau_dict_pt
from onet_tpu.data.simclutter import load_simclutter_pt, filter_by_snr_range


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _write_zy3_pt(path, rng, n=4, size=32):
    d = {}
    for i in range(n):
        d[f"17061585{i:02d}"] = {
            "true_color": torch.tensor(
                rng.random((3, size, size), dtype=np.float64).astype(np.float32)),
            "mask": torch.tensor(
                (rng.random((size, size)) > 0.6).astype(np.float32)),
        }
    torch.save(d, path)
    return d


def _write_nau_pt(path, rng, n=3, size=32):
    d = {}
    for i in range(n):
        d[f"nau_{i:03d}"] = {
            "img": torch.tensor(
                (rng.random((size, size)) * 90 + 10).astype(np.float32)),
            "label": torch.tensor(
                (rng.random((size, size)) > 0.7).astype(np.float32)),
        }
    torch.save(d, path)
    return d


def _write_simclutter_pt(path, rng, n=6, size=32):
    d = {
        "rayleigh_imgs": torch.tensor(
            rng.random((n, 1, size, size), dtype=np.float64).astype(np.float32)),
        "rayleigh_labels": torch.tensor(
            (rng.random((n, size, size)) > 0.9).astype(np.float32)),
        "psnr": [i * 3 // n for i in range(n)],
        "desc": "fixture in the reference generator's dict schema",
    }
    torch.save(d, path)
    return d


def test_zy3_pt_roundtrip(tmp_path, rng):
    path = str(tmp_path / "zy3_fixture.pt")
    d = _write_zy3_pt(path, rng)
    ds, ids = load_zy3_dict_pt(path)
    assert ids == list(d.keys())
    assert ds["imgs"].shape == (4, 32, 32, 3)      # CHW -> HWC
    assert ds["labels"].shape == (4, 32, 32)
    # content parity for one image (transpose only, no rescale)
    want = d[ids[1]]["true_color"].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(ds["imgs"][1]), want, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(ds["labels"][2]),
                                  d[ids[2]]["mask"].numpy())


def test_zy3_pt_no_masks(tmp_path, rng):
    path = str(tmp_path / "zy3_nomask.pt")
    d = {k: {"true_color": v["true_color"]}
         for k, v in _write_zy3_pt(str(tmp_path / "tmp.pt"), rng).items()}
    torch.save(d, path)
    ds, ids = load_zy3_dict_pt(path)
    assert "labels" not in ds.data if hasattr(ds, "data") else True
    assert ds["imgs"].shape[0] == len(ids)


def test_nau_pt_roundtrip(tmp_path, rng):
    path = str(tmp_path / "naurain_fixture.pt")
    d = _write_nau_pt(path, rng)
    ds, ids = load_nau_dict_pt(path)
    assert ids == list(d.keys())
    assert ds["imgs"].shape == (3, 32, 32, 1)
    # per-image min-max normalization applied at construction (:22-28)
    imgs = np.asarray(ds["imgs"])
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0 + 1e-6
    for i in range(3):
        assert abs(imgs[i].min()) < 1e-6 and abs(imgs[i].max() - 1) < 1e-3
    np.testing.assert_array_equal(np.asarray(ds["labels"][0]),
                                  d[ids[0]]["label"].numpy())


def test_simclutter_pt_roundtrip(tmp_path, rng):
    path = str(tmp_path / "rayleigh_fixture.pt")
    d = _write_simclutter_pt(path, rng)
    ds = load_simclutter_pt(path)
    assert ds["imgs"].shape == (6, 32, 32, 1)      # NCHW -> NHWC
    assert ds["labels"].shape == (6, 32, 32)
    np.testing.assert_array_equal(np.asarray(ds["psnr"]), [0, 0, 1, 1, 2, 2])
    np.testing.assert_allclose(
        np.asarray(ds["imgs"][3, ..., 0]),
        d["rayleigh_imgs"][3, 0].numpy(), atol=0)
    sub = filter_by_snr_range(ds, 1, 2)
    assert sub["imgs"].shape[0] == 4


# ---------------------------------------------------------------------------
# CLI end-to-end on the fixtures
# ---------------------------------------------------------------------------

def test_cli_zy3_with_pt_files(tmp_path, rng):
    from onet_tpu.run import main
    train_pt = str(tmp_path / "train.pt")
    test_pt = str(tmp_path / "test.pt")
    _write_zy3_pt(train_pt, rng, n=4)
    _write_zy3_pt(test_pt, rng, n=2)
    out = str(tmp_path / "out")
    main(["zy3", "--train-file", train_pt, "--test-file", test_pt,
          "--epochs", "1", "--batch-sz", "2", "--base-channels", "8",
          "--out-root", out, "--fp32"])
    import glob
    assert glob.glob(out + "/*.npz"), "checkpoint written"
    assert glob.glob(out + "/*.xlsx"), "excel report written"


def test_cli_nau_with_pt_file(tmp_path, rng, capsys):
    from onet_tpu.run import main
    test_pt = str(tmp_path / "nau.pt")
    _write_nau_pt(test_pt, rng, n=2)
    main(["nau", "--test-file", test_pt, "--base-channels", "8",
          "--batch-sz", "2", "--fp32"])
    outp = capsys.readouterr().out
    assert "acc" in outp


def test_cli_simclutter_with_pt_file(tmp_path, rng):
    from onet_tpu.run import main
    data_pt = str(tmp_path / "rayleigh.pt")
    _write_simclutter_pt(data_pt, rng, n=8)
    out = str(tmp_path / "out")
    main(["simclutter", "--data-file", data_pt, "--epochs", "1",
          "--batch-sz", "4", "--base-channels", "8", "--out-root", out,
          "--fp32"])
    import glob
    assert glob.glob(out + "/*.npz"), "checkpoint written"
