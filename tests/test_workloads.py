"""ZY-3 / NAU / two-stage workload slices on tiny synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.data.zy3 import synthesize_zy3
from onet_tpu.data.nau import synthesize_nau_rain
from onet_tpu.data.augment import augment_batch
from onet_tpu.models.onet import onet_init
from onet_tpu.train.zy3 import Zy3Config, train as train_zy3, make_zy3_eval, evaluate_zy3
from onet_tpu.train.nau import test_naurain as naurain_transfer_eval
from onet_tpu.train.two_stage import make_two_stage_eval, verify_two_stage
from onet_tpu.data.arrays import ArrayDataset


def test_synthetic_zy3_shapes():
    ds, ids = synthesize_zy3(jax.random.key(0), n=4, size=64)
    assert ds["imgs"].shape == (4, 64, 64, 3)
    assert ds["labels"].shape == (4, 64, 64)
    frac = float(ds["labels"].mean())
    assert 0.2 < frac < 0.5
    assert len(ids) == 4


def test_augment_batch_preserves_shape_and_range():
    ds, _ = synthesize_zy3(jax.random.key(1), n=4, size=64)
    out = augment_batch(jax.random.key(2), ds["imgs"])
    assert out.shape == ds["imgs"].shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # stochastic: at least one frame must differ from the input
    assert not np.allclose(np.asarray(out), np.asarray(ds["imgs"]))


def test_zy3_training_slice(tmp_path):
    train_ds, _ = synthesize_zy3(jax.random.key(3), n=8, size=64)
    test_full, _ = synthesize_zy3(jax.random.key(4), n=4, size=64)
    cfg = Zy3Config(epoch_nums=3, batch_sz=4, input_sz=64, base_channels=8,
                    base_lr=2e-4, out_root=str(tmp_path), save_epochs=())
    params, bn, history = train_zy3(cfg, train_ds, test_full, log=False)
    assert len(history["loss"]) == 3
    assert np.isfinite(history["loss"]).all()
    m = history["eval"][2]
    assert {"acc", "miou", "dr", "far", "test_loss"} <= set(m)


def test_zy3_excel_report(tmp_path):
    """End-to-end: eval a tiny model over a tiny test set and emit the
    embedded-thumbnail Excel report (reference layout)."""
    import zipfile
    from onet_tpu.train.zy3 import save_zy3_test_results, GROUP_NAMES

    test_ds, ids = synthesize_zy3(jax.random.key(6), n=4, size=64)
    params, bn = onet_init(jax.random.key(0), 3, base=8)
    groups = {g: [ids[i] for i in range(gi, len(ids), 3)]
              for gi, g in enumerate(GROUP_NAMES)}
    path, summary = save_zy3_test_results(
        str(tmp_path / "zy3_report.xlsx"), params, bn, test_ds, ids, groups,
        batch_sz=2)
    assert path.endswith(".xlsx")
    with zipfile.ZipFile(path) as z:
        media = [n for n in z.namelist() if n.startswith("xl/media/")]
        assert len(media) == 4 * 5      # 5 thumbnails per test image
        assert "xl/worksheets/sheet2.xml" in z.namelist()  # summary sheet
    assert set(summary["group"]) >= {"all"}
    assert np.isfinite(summary[summary["group"] == "all"]["acc"]).all()


def test_supervised_zy3_path():
    """CloudDataset_Supervised semantics: joint image+mask augmentation
    (geometry moves both), snow split, and the supervised CE fine-tune
    step runs and is finite."""
    from onet_tpu.data.zy3 import supervised_batches
    from onet_tpu.train.zy3 import make_supervised_train_step
    from onet_tpu.train.optim import adam_init

    ds, ids = synthesize_zy3(jax.random.key(6), n=6, size=32)
    params, bn = onet_init(jax.random.key(1), 3, base=8)
    opt = adam_init(params)
    step = make_supervised_train_step()
    seen = []
    for b in supervised_batches(jax.random.key(2), ds, ids, 3,
                                snow_split=True):
        assert b["imgs"].shape[1:] == (32, 32, 3)
        assert set(np.unique(np.asarray(b["labels"]))) <= {0.0, 1.0, 2.0}
        assert b["cloud"].shape == b["snow"].shape == b["labels"].shape[:3]
        seen += b["ids"]
        params, bn, opt, loss = step(params, bn, opt, b["imgs"],
                                     b["labels"], 1e-4)
        assert np.isfinite(float(loss))
    assert sorted(seen) == sorted(ids)


def test_joint_augmentation_keeps_mask_aligned():
    """Geometric ops must move image and mask together: augment an image
    that EQUALS its mask and check they stay (nearly) identical."""
    from onet_tpu.data.augment import augment_batch_with_masks

    rng = np.random.default_rng(0)
    m = (rng.random((8, 32, 32)) > 0.5).astype(np.float32)
    imgs = jnp.asarray(m[..., None].repeat(3, axis=-1))
    masks = jnp.asarray(m)
    for seed in range(4):
        ai, am = augment_batch_with_masks(jax.random.key(seed), imgs, masks)
        # photometric ops rescale the image; compare binarized mid-threshold
        bi = (np.asarray(ai[..., 0]) > 0.5 * np.asarray(ai[..., 0]).max()
              ) if np.asarray(ai).max() > 0 else np.zeros_like(m)
        agree = (bi == (np.asarray(am) > 0.5)).mean()
        assert agree > 0.95, agree


def test_nau_transfer_eval():
    ds, _ = synthesize_nau_rain(jax.random.key(5), n=4, size=64)
    params, bn = onet_init(jax.random.key(6), 1, base=8)
    out = naurain_transfer_eval(params, bn, ds, batch_sz=2)
    for k in ("acc", "miou", "dr", "far", "tiou",
              "input_psnr", "input_snr", "fg_psnr", "fg_snr"):
        assert np.isfinite(out[k]), (k, out[k])


def test_two_stage_composition():
    ds, _ = synthesize_nau_rain(jax.random.key(7), n=4, size=64)
    p1, b1 = onet_init(jax.random.key(8), 1, base=8)
    p2, b2 = onet_init(jax.random.key(9), 1, base=8)
    report = verify_two_stage(p1, b1, p2, b2, {0: ds, 5: ds}, batch_sz=2)
    assert set(report) == {0, 5, "ave"}
    for stage in ("stage1", "stage2"):
        assert 0 <= report["ave"][stage]["acc"] <= 1


def test_zy3_eval_per_image_lengths():
    ds, ids = synthesize_zy3(jax.random.key(10), n=6, size=64)
    params, bn = onet_init(jax.random.key(11), 3, base=8)
    eval_batch = make_zy3_eval()
    mean, per_img = evaluate_zy3(eval_batch, params, bn, ds, batch_sz=4)
    assert len(per_img["acc"]) == 6
    assert 0 <= mean["acc"] <= 1 and np.isfinite(mean["test_loss"])


def test_snow_mask_split_and_cloud_addition():
    from onet_tpu.data.zy3 import split_snow_mask, synthesize_cloud_addition
    labels = jnp.asarray(np.array([[0, 1], [2, 1]], np.int32))
    cloud, snow = split_snow_mask(labels)
    np.testing.assert_array_equal(np.asarray(cloud), [[0, 1], [0, 1]])
    np.testing.assert_array_equal(np.asarray(snow), [[0, 0], [1, 0]])
    ds, ids = synthesize_cloud_addition(jax.random.key(0), n=3, size=32)
    assert ds["terrain"].shape == (3, 32, 32, 3)
    assert ds["imgs"].shape == (3, 32, 32, 3)
    # composite is brighter than terrain inside cloud mask
    m = np.asarray(ds["labels"][0]) > 0
    assert np.asarray(ds["imgs"][0]).mean(-1)[m].mean() > \
        np.asarray(ds["terrain"][0]).mean(-1)[m].mean()


def test_freeze_params():
    from onet_tpu.train.optim import freeze_params
    g = {"top": {"inc": jnp.ones((2,)), "down1": jnp.ones((2,))}}
    out = freeze_params(g, lambda path: "inc" in path)
    assert float(out["top"]["inc"].sum()) == 0.0
    assert float(out["top"]["down1"].sum()) == 2.0


def test_elastic_and_grid_warps():
    from onet_tpu.data.augment import elastic_warp, grid_distortion
    ds, _ = synthesize_zy3(jax.random.key(12), n=1, size=64)
    img = ds["imgs"][0]
    for fn in (elastic_warp, grid_distortion):
        out = np.asarray(fn(jax.random.key(1), img))
        assert out.shape == img.shape
        assert np.isfinite(out).all()
        # a real warp moves mass but preserves the overall intensity scale
        assert abs(out.mean() - float(img.mean())) < 0.15
        assert not np.allclose(out, np.asarray(img))
