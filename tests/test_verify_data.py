"""Real-data conformance kit (data/verify.py, `run verify-data`).

A future real ZY-3/NAU/simclutter .pt drop-in must be a one-command
acceptance test: schema sniffing, key/dtype/shape contract, stats,
and a one-batch jitted forward — against the reference schemas
(zy3_cloud_thumbnailv5_20240304.py:80-106, nau_rain_20230523.py:12-38,
simbg4onet_20230209.py:106-112)."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from onet_tpu.data.verify import (ConformanceError, format_report,
                                  verify_dataset)


@pytest.fixture(scope="module")
def pt_files(tmp_path_factory):
    from onet_tpu.data.export import (export_nau_pt, export_simclutter_pt,
                                      export_zy3_pt)
    from onet_tpu.data.nau import synthesize_nau_rain
    from onet_tpu.data.zy3 import synthesize_zy3
    from onet_tpu.sim.rayleigh import generate_rayleigh_dataset

    root = tmp_path_factory.mktemp("verify")
    sim = generate_rayleigh_dataset(jax.random.key(0), levels=(1, 2),
                                    frames_per_level=2, crop=32)
    zy3, zy3_ids = synthesize_zy3(jax.random.key(1), n=3, size=32)
    nau, nau_ids = synthesize_nau_rain(jax.random.key(2), n=3, size=32)
    paths = {
        "simclutter": export_simclutter_pt(str(root / "sim.pt"), sim),
        "zy3": export_zy3_pt(str(root / "zy3.pt"), zy3, zy3_ids),
        "nau": export_nau_pt(str(root / "nau.pt"), nau, nau_ids),
    }
    return paths


@pytest.mark.parametrize("wl", ["simclutter", "zy3", "nau"])
def test_conformant_files_pass(pt_files, wl):
    report = verify_dataset(pt_files[wl], "auto")
    assert report["workload"] == wl  # schema sniffed correctly
    assert report["ok"], report["issues"]
    assert report["n"] >= 3
    assert report["imgs"]["shape"][0] >= 3
    # the eval probe actually ran a forward + loss
    assert np.isfinite(report["eval"]["loss"])
    assert 0.0 <= report["eval"]["mask_mean"] <= 1.0
    out = format_report(report)
    assert "OK" in out and wl in out


def test_explicit_workload_override(pt_files):
    # forcing the wrong schema must fail with issues, not crash
    report = verify_dataset(pt_files["zy3"], "nau", eval_batch=False)
    assert not report["ok"]
    assert any("img" in i for i in report["issues"])


def test_bad_shape_reported(tmp_path):
    # simclutter with NHWC imgs (our layout) instead of the reference NCHW
    torch.save({"rayleigh_imgs": torch.zeros(4, 32, 32, 1),
                "rayleigh_labels": torch.zeros(4, 32, 32),
                "psnr": [1, 1, 2, 2]}, tmp_path / "bad.pt")
    report = verify_dataset(str(tmp_path / "bad.pt"))
    assert not report["ok"]
    assert any("[N,1,H,W]" in i for i in report["issues"])


def test_missing_keys_and_nonfinite(tmp_path):
    imgs = np.zeros((2, 1, 16, 16), np.float32)
    imgs[0, 0, 0, 0] = np.nan
    torch.save({"rayleigh_imgs": torch.from_numpy(imgs),
                "rayleigh_labels": torch.zeros(2, 16, 16)},
               tmp_path / "nan.pt")
    report = verify_dataset(str(tmp_path / "nan.pt"))
    assert not report["ok"]
    assert any("psnr" in i for i in report["issues"])
    assert any("non-finite" in i for i in report["issues"])


def test_mask_levels_contract(tmp_path):
    torch.save({"k" + str(i): {"true_color": torch.rand(3, 16, 16),
                               "mask": torch.full((16, 16), 0.5)}
                for i in range(2)}, tmp_path / "levels.pt")
    report = verify_dataset(str(tmp_path / "levels.pt"))
    assert not report["ok"]
    assert any("levels" in i for i in report["issues"])


def test_unidentifiable_raises(tmp_path):
    torch.save([1, 2, 3], tmp_path / "junk.pt")
    with pytest.raises(ConformanceError):
        verify_dataset(str(tmp_path / "junk.pt"))
    torch.save({"foo": torch.zeros(3)}, tmp_path / "flat.pt")
    with pytest.raises(ConformanceError):
        verify_dataset(str(tmp_path / "flat.pt"))


def test_cli(pt_files, capsys):
    from onet_tpu import run as cli

    cli.main(["verify-data", pt_files["nau"]])
    out = capsys.readouterr().out
    assert "workload=nau" in out and "OK" in out

    # a failing file exits nonzero (acceptance-test contract)
    torch.save({"x_imgs": torch.zeros(1, 2, 8, 8)}, "/tmp/verify_bad.pt")
    with pytest.raises(SystemExit):
        cli.main(["verify-data", "/tmp/verify_bad.pt"])
