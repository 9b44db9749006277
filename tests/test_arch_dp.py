"""Data-parallel training for the ablation backbone families.

The arch registry (models/arch.py) plugs alternate backbones into the same
jitted train step; GSPMD data parallelism must hold for them exactly as it
does for the vanilla conv U-Net (tests/test_dp_equivalence.py): the
sharded step over the virtual mesh produces the same loss and updated
parameters as the single-device step on the identical global batch.
Stateless (LayerNorm) backbones have no cross-device statistics at all, so
agreement is limited only by fp32 reassociation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.core.mesh import make_mesh, batch_sharding, replicated
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step

TINY = {
    "swin": lambda: _swin(),
    "convnext": lambda: _convnext(),
    "transunet": lambda: _transunet(),
}


def _swin():
    from onet_tpu.models.swin import swin_onet_init, swin_onet_forward
    p, s = swin_onet_init(jax.random.key(0), 1, window=2, embed_dim=12)
    return p, s, swin_onet_forward, 64


def _convnext():
    from onet_tpu.models.convnext import (convnext_onet_forward,
                                          convnext_onet_init)
    p, s = convnext_onet_init(jax.random.key(0), 1, embed_dim=16,
                              depths=(1, 1, 2, 1))
    return p, s, convnext_onet_forward, 64


def _transunet():
    from onet_tpu.models.transunet import (transunet_onet_forward,
                                           transunet_onet_init)
    p, s = transunet_onet_init(jax.random.key(0), 1, embed_dim=96, depth=1,
                               img_size=64)
    return p, s, transunet_onet_forward, 64


@pytest.mark.parametrize("arch", sorted(TINY))
def test_sharded_arch_step_matches_single_device(arch):
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the 8-device virtual mesh")
    params, state, forward, hw = TINY[arch]()
    mesh = make_mesh(shape=(8, 1))
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(0, 1, (8, hw, hw, 1)).astype(np.float32))

    copy = lambda t: jax.tree.map(lambda a: jnp.array(a, copy=True), t)

    ref_step = make_train_step(forward=forward)
    p1, _, _, loss1 = ref_step(copy(params), copy(state),
                               adam_init(params), x, 1e-4)

    sh_step = make_train_step(forward=forward, mesh=mesh)
    rep = replicated(mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    p2, _, _, loss2 = sh_step(jax.device_put(copy(params), rep),
                              jax.device_put(copy(state), rep),
                              jax.device_put(adam_init(params), rep),
                              xs, 1e-4)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 2e-2, rel
