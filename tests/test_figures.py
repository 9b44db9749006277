"""Figure-suite smoke tests: every reference figure layout has a counterpart
that renders and writes a PNG (utils_20231218.py:479-659 layouts +
draw_test_res, uti_zy3_test_20240123.py:42-97)."""

import os

import numpy as np
import pytest

from onet_tpu.report import curves


@pytest.fixture
def imgs(rng):
    return {
        "x": rng.random((5, 16, 16, 1)).astype(np.float32),
        "map": rng.random((5, 16, 16)).astype(np.float32),
        "mask": (rng.random((5, 16, 16)) > 0.5).astype(np.float32),
    }


def test_tensor_matrix(tmp_path, imgs):
    p = curves.save_tensor_matrix(
        str(tmp_path / "m.png"),
        [imgs["x"], imgs["map"], imgs["mask"]], title="onet_img")
    assert os.path.getsize(p) > 0


def test_nau_rain_grid(tmp_path, imgs):
    p = curves.save_nau_rain_grid(
        str(tmp_path / "nau.png"), imgs["x"],
        [f"20230501_{i:02d}_rain" for i in range(5)],
        imgs["map"], imgs["map"], imgs["mask"], imgs["mask"],
        title="nau")
    assert os.path.getsize(p) > 0


def test_two_stage_grid(tmp_path, imgs):
    p = curves.save_two_stage_grid(
        str(tmp_path / "ts.png"), imgs["x"], imgs["x"], imgs["x"],
        imgs["mask"], imgs["mask"], imgs["mask"], title="2nd")
    assert os.path.getsize(p) > 0


def test_loss_acc_curves(tmp_path):
    p = curves.save_loss_acc_curves(
        str(tmp_path / "c.png"), [3.0, 2.0, 1.0], [0.5, 0.7, 0.9],
        [0.3, 0.5, 0.6])
    assert os.path.getsize(p) > 0


def test_test_res_grids_naming(tmp_path, imgs):
    rows = [{"img_id": f"id_{i}", "acc": 0.9, "miou": 0.8,
             "rgb": imgs["x"][i % 5], "label": imgs["mask"][i % 5],
             "pred": imgs["mask"][i % 5], "vt": imgs["map"][i % 5],
             "vd": imgs["map"][i % 5], "dr": 0.5, "far": 0.01}
            for i in range(7)]
    paths = curves.save_test_res_grids(
        str(tmp_path), "onet_zy3", rows, test_loss=1.2, acc=0.91,
        miou=0.82, epoch=10, draw_all=False)
    assert len(paths) == 1
    name = os.path.basename(paths[0])
    assert name.startswith("onet_zy3_epoch_010_round_0_acc_0.9100")
    assert "far_" in name and name.endswith(".png")
    # draw_all covers every sample in ceil(n/5) rounds
    paths = curves.save_test_res_grids(
        str(tmp_path), "onet_zy3", rows, test_loss=1.2, acc=0.91,
        miou=0.82, draw_all=True)
    assert len(paths) == 1  # 7 // 5 = 1 full round (reference semantics)


def test_two_stage_draw(tmp_path):
    """draw_two_stage end-to-end on a tiny model."""
    import jax
    import jax.numpy as jnp
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.two_stage import make_two_stage_eval, draw_two_stage

    p1, b1 = onet_init(jax.random.key(0), 1, base=8)
    p2, b2 = onet_init(jax.random.key(1), 1, base=8)
    rng = np.random.default_rng(0)
    batch = {"imgs": jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1))
                                 .astype(np.float32)),
             "labels": jnp.asarray((rng.random((2, 32, 32)) > 0.8)
                                   .astype(np.float32))}
    eval_batch = make_two_stage_eval()
    p = draw_two_stage(str(tmp_path / "2stage.png"), eval_batch,
                       p1, b1, p2, b2, batch)
    assert os.path.getsize(p) > 0


def test_segmentation_grid_v1(tmp_path, imgs, rng):
    """The v1 show_segmentation layout (utils_20231218.py:479-533):
    channel rows + gt + pred, for single-channel, multi-channel, and
    rgb inputs."""
    p = curves.save_segmentation_grid(
        str(tmp_path / "seg1.png"), imgs["x"], imgs["mask"], imgs["mask"],
        title="radar")
    assert os.path.getsize(p) > 0
    rgb = rng.random((5, 16, 16, 3)).astype(np.float32)
    p = curves.save_segmentation_grid(
        str(tmp_path / "seg3.png"), rgb, imgs["mask"], imgs["mask"])
    assert os.path.getsize(p) > 0
    two_chn = rng.random((5, 16, 16, 2)).astype(np.float32)
    p = curves.save_segmentation_grid(
        str(tmp_path / "seg2.png"), two_chn, imgs["mask"], imgs["mask"])
    assert os.path.getsize(p) > 0


def test_adversarial_grid_v1(tmp_path, imgs):
    """The v1 show_unet_adversarial layout (utils_20231218.py:534-552)."""
    p = curves.save_adversarial_grid(
        str(tmp_path / "adv.png"), imgs["x"], imgs["map"], imgs["map"],
        imgs["mask"], title="sim")
    assert os.path.getsize(p) > 0
