"""ZY-3 raw-imagery on-ramp + preprocessing-selection workload.

The fifth BASELINE workload end-to-end: raw jpg/png directories ->
thumbnails/masks (make_thrumnail_image/make_thumnail_mask,
test_pre_processing_on_zy3_testset_20240607.py:99-212) -> oracle or
classified preprocessing selection (:261-472) -> best-dict .pt + xlsx
(:506-562), driven through both the API and the CLI."""

import os
import zipfile

import numpy as np
import pytest

import jax

from onet_tpu.preprocess import onramp
from onet_tpu.preprocess.image import PRE_OPTIONS


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(7)
    src = tmp_path_factory.mktemp("zy3src")
    msk = tmp_path_factory.mktemp("zy3mask")
    ids = ["1700000001", "1700000002", "1706158599"]
    for i in ids:
        img = rng.integers(0, 255, (130, 160, 3), dtype=np.uint8)
        Image.fromarray(img).save(src / f"scene_{i}.jpg")
        mask = ((rng.random((130, 160)) > 0.6) * 255).astype(np.uint8)
        Image.fromarray(mask).save(msk / f"label_{i}.png")
    # one grayscale scene: the reference L->RGB converts (:108-112)
    gray = rng.integers(0, 255, (130, 160), dtype=np.uint8)
    Image.fromarray(gray, mode="L").save(src / "scene_1700000003.jpg")
    Image.fromarray((gray > 128).astype(np.uint8) * 255).save(
        msk / "label_1700000003.png")
    return str(src), str(msk), ids + ["1700000003"]


def test_id_from_filename():
    # plain name: last token before the extension (:104-105)
    assert onramp.id_from_filename("/a/zy3_scene_1700000001.jpg") == \
        "1700000001"
    # a 'pre'-tagged name: second-to-last token (:101-103)
    assert onramp.id_from_filename("/a/scene_1700000002_pre_raw.jpg") == \
        "pre"  # matches the reference literally: split('_')[-2]
    assert onramp.id_from_filename("scene_12345_pre.jpg") == "12345"


def test_variant_options_strong_skip():
    """contrast_enhance_haze_enhance admissible only for 1706158599
    (choose_test_preprocess :412-413)."""
    opts = onramp._variant_options("1700000001", PRE_OPTIONS)
    assert onramp.STRONG_OPTION not in opts and len(opts) == 8
    opts = onramp._variant_options("1706158599", PRE_OPTIONS)
    assert onramp.STRONG_OPTION in opts and len(opts) == 9


def test_prepare_thumbnails(scene_dirs):
    src, msk, ids = scene_dirs
    files = onramp.list_scene_files(src)
    masks = onramp.list_scene_files(msk)
    assert len(files) == len(masks) == 4
    prepared, got_ids = onramp.prepare_zy3_thumbnails(
        files, masks, pre_option="raw_rgb", resize_to=80, crop=64)
    assert got_ids == sorted(ids)
    for pid in got_ids:
        rec = prepared[pid]
        assert rec["img"].shape == (64, 64, 3)
        assert rec["img"].dtype == np.float32
        assert 0.0 <= rec["img"].min() and rec["img"].max() <= 1.0
        assert rec["mask"].shape == (64, 64)
        assert set(np.unique(rec["mask"])) <= {0.0, 1.0}
    # the id-1706158599 all-ones mask hack (:203-210)
    assert np.all(prepared["1706158599"]["mask"] == 1.0)


def test_save_zy3_dict_pt_roundtrip(scene_dirs, tmp_path):
    torch = pytest.importorskip("torch")
    from onet_tpu.data.zy3 import load_zy3_dict_pt

    src, msk, _ = scene_dirs
    prepared, ids = onramp.prepare_zy3_thumbnails(
        onramp.list_scene_files(src), onramp.list_scene_files(msk),
        resize_to=80, crop=64)
    path = str(tmp_path / "prep.pt")
    onramp.save_zy3_dict(path, prepared, id_prefix="zy3_test_")
    ds, loaded_ids = load_zy3_dict_pt(path)
    assert loaded_ids == ["zy3_test_" + i for i in ids]
    assert np.asarray(ds["imgs"]).shape == (4, 64, 64, 3)
    assert np.asarray(ds["labels"]).shape == (4, 64, 64)
    raw = torch.load(path, map_location="cpu")
    assert raw[loaded_ids[0]]["true_color"].shape == (3, 64, 64)

    npz = str(tmp_path / "prep.npz")
    onramp.save_zy3_dict(npz, prepared)
    with np.load(npz) as z:
        assert z["imgs"].shape == (4, 64, 64, 3)
        assert list(z["ids"]) == ids


@pytest.fixture(scope="module")
def tiny_model():
    from onet_tpu.models.onet import onet_init

    return onet_init(jax.random.key(3), 3, base=8)


def test_choose_preprocess_oracle(scene_dirs, tiny_model):
    src, msk, _ = scene_dirs
    params, bn = tiny_model
    files = onramp.list_scene_files(src)
    masks = onramp.list_scene_files(msk)
    options = ("raw_rgb", "histeq_rgb", "haze_enhance")
    best, rows = onramp.choose_preprocess(
        params, bn, files, masks, options=options,
        resize_to=80, crop=64)
    assert set(best) == {"zy3_test_" + onramp.id_from_filename(f)
                         for f in files}
    for key, rec in best.items():
        assert rec["opt"] in options
        assert 0.0 <= rec["acc"] <= 1.0 and 0.0 <= rec["miou"] <= 1.0
        if key != "zy3_test_1706158599":
            # the 1706158599 all-ones mask has no clutter region, so its
            # SNR is legitimately +inf (reference hack, :203-210)
            assert np.isfinite(rec["org_snr"])
    # the kept variant is per-image best-mIoU (oracle selection :417-419)
    per_img = {}
    for r in rows:
        per_img.setdefault(r["img_id"], r)
    mious = [r["miou"] for r in rows]
    assert mious == sorted(mious, reverse=True)  # report sorted desc (:445)


def test_classified_choose(scene_dirs, tiny_model):
    src, msk, _ = scene_dirs
    params, bn = tiny_model
    files = onramp.list_scene_files(src)
    masks = onramp.list_scene_files(msk)
    ids = ["zy3_test_" + onramp.id_from_filename(f) for f in files]
    groups = {"normal_cloud": ids[:1], "thin_cloud": ids[1:2],
              "snow_cloud": ids[2:]}
    best, rows = onramp.classified_choose(
        params, bn, files, masks, groups, resize_to=80, crop=64)
    # the fixed assignment (classified_preprocess :297-305)
    assert best[ids[0]]["opt"] == "haze_enhance"
    assert best[ids[1]]["opt"] == "haze_enhance"
    assert best[ids[2]]["opt"] == "contrast_enhance_haze_remove"
    assert all(r["classified_type"] for r in rows)


def test_cli_prepare_zy3(scene_dirs, tmp_path):
    pytest.importorskip("torch")
    from onet_tpu import run as cli
    from onet_tpu.data.zy3 import load_zy3_dict_pt

    src, msk, _ = scene_dirs
    out = str(tmp_path / "prepared.pt")
    cli.main(["prepare-zy3", "--src", src, "--masks", msk,
              "--pre-option", "histeq_rgb", "--out", out,
              "--resize-to", "80", "--crop", "64",
              "--id-prefix", "zy3_test_"])
    ds, ids = load_zy3_dict_pt(out)
    assert len(ids) == 4 and ids[0].startswith("zy3_test_")
    assert np.asarray(ds["imgs"]).shape == (4, 64, 64, 3)


@pytest.mark.slow
def test_cli_choose_preprocess_e2e(scene_dirs, tmp_path):
    """The full fifth workload through the CLI at the reference's 224
    thumbnail size: selection -> best dict .pt -> xlsx report ->
    divided-testset evaluation (reference __main__, :506-562)."""
    pytest.importorskip("torch")
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.data.zy3 import load_zy3_dict_pt
    from onet_tpu.models.onet import onet_init

    src, msk, _ = scene_dirs
    params, bn = onet_init(jax.random.key(4), 3, base=8)
    ck = str(tmp_path / "m_epoch_1.npz")
    save_checkpoint(ck, params, bn, 1)
    out_dict = str(tmp_path / "best.pt")
    cli.main(["zy3", "--choose-preprocess", src, "--choose-masks", msk,
              "--model", ck, "--out-root", str(tmp_path),
              "--out-dict", out_dict, "--fp32"])
    ds, ids = load_zy3_dict_pt(out_dict)
    assert len(ids) == 4
    assert np.asarray(ds["imgs"]).shape == (4, 224, 224, 3)
    xlsxes = [f for f in os.listdir(tmp_path) if f.endswith(".xlsx")]
    assert any("best_preprocess" in f for f in xlsxes)
    assert any("zy3_results" in f for f in xlsxes)
    # the report is a valid OOXML zip with the summary inside
    report = [f for f in xlsxes if "best_preprocess" in f][0]
    with zipfile.ZipFile(os.path.join(tmp_path, report)) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()
