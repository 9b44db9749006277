"""The OUTBOUND data bridge: TPU-generated datasets written as the
reference's own .pt schemas (data/export.py) and proven loadable both by
our ingestion loaders and by re-implementations of the reference's exact
read logic (torch-side key/layout access).

Mirrors of test_pt_ingestion.py: that file proves reference->us; this one
proves us->reference and the round trip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from onet_tpu.data.export import (export_nau_pt, export_simclutter_pt,
                                  export_zy3_pt)
from onet_tpu.data.nau import load_nau_dict_pt, synthesize_nau_rain
from onet_tpu.data.simclutter import load_simclutter_pt
from onet_tpu.data.zy3 import load_zy3_dict_pt, synthesize_zy3
from onet_tpu.sim.rayleigh import generate_rayleigh_dataset


def test_simclutter_pt_export_reference_schema(tmp_path):
    # tiny device-generated dataset -> reference .pt dict
    d = generate_rayleigh_dataset(jax.random.key(0), levels=(0, 2),
                                  frames_per_level=3, crop=64)
    path = str(tmp_path / "rayleigh_2sigma.pt")
    export_simclutter_pt(path, d, bg="rayleigh")

    # the reference's loader reads d['%s_imgs' % bg] / labels / psnr
    # (dataloader/simbg4onet_20230209.py:106-112) — keys, dtypes, layout:
    ref = torch.load(path, map_location="cpu")
    assert set(ref) == {"rayleigh_imgs", "rayleigh_labels", "psnr", "desc"}
    assert ref["rayleigh_imgs"].shape == (6, 1, 64, 64)   # NCHW like torch
    assert ref["rayleigh_imgs"].dtype == torch.float32
    assert ref["rayleigh_labels"].shape == (6, 64, 64)
    assert ref["psnr"] == [0, 0, 0, 2, 2, 2]
    assert isinstance(ref["desc"], str) and "rayleigh" in ref["desc"]

    # full round trip through OUR ingestion path: bit-identical frames
    back = load_simclutter_pt(path)
    np.testing.assert_array_equal(np.asarray(back["imgs"]),
                                  np.asarray(d["imgs"]))
    np.testing.assert_array_equal(np.asarray(back["labels"]),
                                  np.asarray(d["labels"]))
    np.testing.assert_array_equal(np.asarray(back["psnr"]),
                                  np.asarray(d["psnr"]))


def test_simclutter_pt_export_k_bg_keys(tmp_path):
    d = {"imgs": np.zeros((2, 8, 8, 1), np.float32),
         "labels": np.zeros((2, 8, 8), np.float32),
         "psnr": np.array([5, 5])}
    path = str(tmp_path / "k.pt")
    export_simclutter_pt(path, d, bg="k")
    ref = torch.load(path, map_location="cpu")
    # CLI alias 'k' maps to the reference's bg_type name 'kdist', matching
    # prepare_data's '%s_imgs' % bg_type (Rayleigh_bg_...:312)
    assert "kdist_imgs" in ref and "kdist_labels" in ref
    assert "kdist" in ref["desc"]


def test_zy3_pt_export_round_trip(tmp_path):
    ds, ids = synthesize_zy3(jax.random.key(1), n=3, size=32)
    path = str(tmp_path / "zy3_train.pt")
    export_zy3_pt(path, ds, ids)

    ref = torch.load(path, map_location="cpu")
    assert list(ref) == list(ids)
    rec = ref[ids[0]]
    assert rec["true_color"].shape == (3, 32, 32)  # CHW (reference layout)
    assert rec["mask"].shape == (32, 32)

    back, back_ids = load_zy3_dict_pt(path)
    assert back_ids == list(ids)
    np.testing.assert_array_equal(np.asarray(back["imgs"]),
                                  np.asarray(ds["imgs"]))
    np.testing.assert_array_equal(np.asarray(back["labels"]),
                                  np.asarray(ds["labels"]))


def test_zy3_pt_export_unsupervised_no_masks(tmp_path):
    # train dicts may omit masks (CloudDataset_Unsupervised consumes only
    # 'true_color'); the loader tolerates that
    ds, ids = synthesize_zy3(jax.random.key(2), n=2, size=16)
    path = str(tmp_path / "zy3_unsup.pt")
    export_zy3_pt(path, ds, ids, with_masks=False)
    ref = torch.load(path, map_location="cpu")
    assert "mask" not in ref[ids[0]]
    back, _ = load_zy3_dict_pt(path)
    assert "labels" not in back.data


def test_nau_pt_export_round_trip(tmp_path):
    ds, ids = synthesize_nau_rain(jax.random.key(3), n=2, size=24)
    path = str(tmp_path / "naurain_dict.pt")
    export_nau_pt(path, ds, ids)

    ref = torch.load(path, map_location="cpu")
    assert list(ref) == list(ids)
    assert ref[ids[0]]["img"].shape == (24, 24)
    assert ref[ids[0]]["label"].shape == (24, 24)

    back, back_ids = load_nau_dict_pt(path)
    assert back_ids == list(ids)
    # synthesize_nau_rain frames are already min-max normalized, and the
    # loader re-normalizes (idempotent) -> exact round trip
    np.testing.assert_allclose(np.asarray(back["imgs"]),
                               np.asarray(ds["imgs"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back["labels"]),
                                  np.asarray(ds["labels"]))


def test_cli_gen_data_pt_e2e(tmp_path):
    """`run gen-data --out x.pt` writes a loadable reference-schema file,
    and `run simclutter --data-file x.pt` trains from it."""
    from onet_tpu.run import main
    out = str(tmp_path / "gen.pt")
    main(["gen-data", "--out", out, "--levels", "0-2",
          "--frames-per-level", "2", "--crop", "32"])
    ref = torch.load(out, map_location="cpu")
    assert ref["rayleigh_imgs"].shape == (6, 1, 32, 32)

    run_out = str(tmp_path / "run")
    main(["simclutter", "--data-file", out, "--epochs", "1",
          "--batch-sz", "2", "--base-channels", "4", "--out-root", run_out,
          "--fp32"])
    import glob
    assert glob.glob(run_out + "/*.npz"), "trained from exported .pt"


def test_cli_gen_data_zy3_nau_pt(tmp_path):
    # zy3 scenes default to 224^2 RGB, nau frames to 200^2 single-channel
    from onet_tpu.run import main
    for wl, key, shape in (("zy3", "true_color", (3, 224, 224)),
                           ("nau", "img", (200, 200))):
        out = str(tmp_path / f"{wl}.pt")
        main(["gen-data", "--workload", wl, "--n", "2", "--out", out])
        ref = torch.load(out, map_location="cpu")
        assert len(ref) == 2
        first = next(iter(ref.values()))
        assert tuple(first[key].shape) == shape
