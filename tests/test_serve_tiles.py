"""Tiled serving (serve/tiles.py): coverage, shape stability, agreement
with whole-scene inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init
from onet_tpu.serve import infer_tiled
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


@pytest.fixture(scope="module")
def model_and_scene():
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    opt = adam_init(params)
    step = make_train_step()
    x = jax.random.uniform(jax.random.key(7), (8, 32, 32, 1))
    x = x.at[:, 8:16, 8:16, :].add(1.5).clip(0, 1)
    for _ in range(30):
        params, bn, opt, _ = step(params, bn, opt, x, 1e-3)
    folded = fold_onet(params, bn)
    rng = np.random.default_rng(3)
    scene = rng.uniform(0, 0.6, (96, 112, 1)).astype(np.float32)
    for (cy, cx) in [(20, 30), (60, 80), (45, 55)]:
        scene[cy - 4:cy + 4, cx - 4:cx + 4, :] += 0.4
    return folded, np.clip(scene, 0, 1)


def _infer(folded, xb):
    return onet_infer(folded, xb, policy=BF16_COMPUTE)


def test_tiled_matches_whole_scene(model_and_scene):
    folded, scene = model_and_scene
    whole = np.asarray(_infer(folded, jnp.asarray(scene[None]))[1][0])
    tiled = infer_tiled(_infer, folded, scene, tile=48, halo=24, batch=4)
    assert tiled.shape == scene.shape[:2]
    agree = float((tiled == whole).mean())
    assert agree >= 0.97, f"tiled-vs-whole agreement {agree:.4f}"


def test_tiled_covers_non_multiple_sizes(model_and_scene):
    folded, scene = model_and_scene
    odd = scene[:70, :50, :]   # not multiples of the tile
    out = infer_tiled(_infer, folded, odd, tile=48, halo=8, batch=4)
    assert out.shape == (70, 50)
    assert set(np.unique(out)) <= {0, 1}


def test_tiled_small_scene_single_window(model_and_scene):
    folded, scene = model_and_scene
    small = scene[:32, :32, :]
    out = infer_tiled(_infer, folded, small, tile=48, halo=8, batch=2)
    assert out.shape == (32, 32)
