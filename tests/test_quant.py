"""Int8 PTQ serving path: calibration -> quantization -> agreement with the
bf16 folded graph (models/quant.py). Small model on CPU; the full-size
>=99% gate on a trained checkpoint runs on TPU (runs/quant_validate.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init
from onet_tpu.models.quant import calibrate, quantize_folded, onet_infer_q
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step


@pytest.fixture(scope="module")
def trained_small():
    """A few real train steps so features/masks have structure (a random
    init's masks sit on the softmax knife-edge and agreement is noise)."""
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    opt = adam_init(params)
    step = make_train_step()
    key = jax.random.key(7)
    x = jax.random.uniform(key, (8, 32, 32, 1))
    x = x.at[:, 8:16, 8:16, :].add(1.5).clip(0, 1)  # bright blobs
    for _ in range(30):
        params, bn, opt, loss = step(params, bn, opt, x, 1e-3)
    folded = fold_onet(params, bn)
    return folded, x


def test_quant_runs_and_matches_shapes(trained_small):
    folded, x = trained_small
    scales = calibrate(folded, x)
    assert all((v > 0).all() for v in scales.values())
    q = quantize_folded(folded, scales)
    s, labels = onet_infer_q(q, x)
    assert s.shape == (*x.shape[:3], 2)
    assert labels.shape == x.shape[:3]
    assert bool(jnp.all(jnp.isfinite(s)))


import pytest


@pytest.mark.parametrize("head_bf16", [True, False])
def test_quant_mask_agreement(trained_small, head_bf16):
    folded, x = trained_small
    scales = calibrate(folded, x)
    q = quantize_folded(folded, scales)
    s_bf, lab_bf = onet_infer(folded, x, policy=BF16_COMPUTE)
    s_q, lab_q = onet_infer_q(q, x, head_bf16=head_bf16)
    agree = float(jnp.mean((lab_q == lab_bf).astype(jnp.float32)))
    assert agree >= 0.95, f"mask agreement {agree:.4f}"
    # projection probabilities stay close in the bulk
    med = float(jnp.median(jnp.abs(s_q - s_bf)))
    assert med < 0.05, f"median |dS| {med:.4f}"


def test_weight_quantization_roundtrip():
    # per-output-channel symmetric quantization reconstructs within 1 step
    from onet_tpu.models.quant import _quant_w
    w = jax.random.normal(jax.random.key(1), (3, 3, 8, 16)) * 0.1
    wq, sw = _quant_w(w)
    err = jnp.abs(wq.astype(jnp.float32) * sw - w)
    assert float(jnp.max(err)) <= float(jnp.max(sw)) * 0.5 + 1e-7


def test_quant_odd_feature_shapes():
    """NAU-style inputs whose feature maps go odd mid-net (200^2 -> 25^2 at
    down3): _pool_q floor-crops and the decoder pads to the skip size, like
    layers._pool_val / unet_infer_stacked (ADVICE r2: the int8 path crashed
    on these shapes)."""
    params, bn = onet_init(jax.random.key(5), 1, base=8)
    folded = fold_onet(params, bn)
    x = jax.random.uniform(jax.random.key(6), (2, 50, 50, 1))
    scales = calibrate(folded, x)          # taps mirror must also pad
    q = quantize_folded(folded, scales)
    s, labels = onet_infer_q(q, x)
    assert labels.shape == (2, 50, 50)
    assert bool(jnp.all(jnp.isfinite(s)))
    # agreement with the bf16 graph holds on the padded shapes too
    _, lab_bf = onet_infer(folded, x, policy=BF16_COMPUTE)
    agree = float(jnp.mean((labels == lab_bf).astype(jnp.float32)))
    assert agree >= 0.9, f"mask agreement {agree:.4f}"


def test_quant_three_channel_zy3_shape():
    # ZY-3 path: cin=3 RGB; the stacked input is 6-channel
    params, bn = onet_init(jax.random.key(5), 3, base=8)
    folded = fold_onet(params, bn)
    x = jax.random.uniform(jax.random.key(6), (2, 32, 32, 3))
    scales = calibrate(folded, x)
    q = quantize_folded(folded, scales)
    s, labels = onet_infer_q(q, x)
    assert labels.shape == (2, 32, 32)
    assert bool(jnp.all(jnp.isfinite(s)))
