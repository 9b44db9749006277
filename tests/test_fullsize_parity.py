"""FULL-SIZE parity gate: base=64 (31M params), 224x224 inputs.

The BASELINE.json target ("pixel agreement with the PyTorch reference
>= 99%") is demonstrated here at the flagship size, not just the base=8
toy width used by test_model_parity: eval-mode forward with weights copied
from the torch oracle, asserting V-logit closeness and mask agreement.
Runs on the 1-core CPU host in a few minutes; set ONET_SKIP_FULLSIZE=1 to
skip in quick iterations.

Reference architecture: Onet_vanilla_20240606.py:104-191 (channels
64..1024, weight-shared twin, einsum projection + Softmax2d).
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from onet_tpu.models import onet_init, onet_forward, predict_label
from tests.test_model_parity import copy_params_from_torch
from tests.torch_mirror import MirrorOnet

pytestmark = pytest.mark.skipif(
    os.environ.get("ONET_SKIP_FULLSIZE") == "1",
    reason="full-size parity skipped by ONET_SKIP_FULLSIZE=1")


def test_fullsize_eval_forward_parity():
    torch.manual_seed(1981)
    tnet = MirrorOnet(cin=1, base=64, share=True)
    tnet.eval()
    params, state = onet_init(jax.random.key(0), 1, base=64)
    params, state = copy_params_from_torch(tnet, params, state)
    # randomize the BN running stats so eval normalization is non-trivial
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    params, state = copy_params_from_torch(tnet, params, state)

    x = np.random.default_rng(7).uniform(0, 1, (2, 1, 224, 224)).astype(np.float32)

    with torch.no_grad():
        lt, vt, ld, vd, s = tnet(torch.tensor(x))
    t_vt = vt.squeeze(1).numpy()
    t_vd = vd.squeeze(1).numpy()
    t_mask = s.argmax(dim=1).numpy()

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = jax.jit(
        lambda p, st, xx: onet_forward(p, st, xx, train=False)[0]
    )(params, state, xj)
    j_vt = np.asarray(out.Vt)
    j_vd = np.asarray(out.Vd)
    j_mask = np.asarray(predict_label(out.S))

    scale = max(np.abs(t_vt).max(), np.abs(t_vd).max())
    assert np.abs(j_vt - t_vt).max() / scale < 1e-3
    assert np.abs(j_vd - t_vd).max() / scale < 1e-3
    agreement = float((j_mask == t_mask).mean())
    assert agreement >= 0.99, agreement
