"""Max-pool primitive: torch MaxPool2d(2) floor semantics, value + grad.

Regression for the odd-spatial case (NAU's 200^2 input reaches 25^2 at
down3; torch floor-drops the trailing row/col — F.max_pool2d default
ceil_mode=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.models.layers import max_pool_2x2, _pool_reduce_window

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("h,w", [(8, 8), (25, 25), (25, 32), (7, 9)])
def test_max_pool_matches_torch_value_and_grad(h, w):
    rng = np.random.default_rng(h * 100 + w)
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)

    def f(xj):
        return jnp.sum(max_pool_2x2(xj) * jnp.arange(1.0, 4.0))

    y = np.asarray(max_pool_2x2(jnp.asarray(x)))
    g = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 2)
    (yt * torch.arange(1.0, 4.0)[None, :, None, None]).sum().backward()

    np.testing.assert_allclose(
        y, np.transpose(yt.detach().numpy(), (0, 2, 3, 1)), rtol=0, atol=0)
    np.testing.assert_allclose(
        g, np.transpose(xt.grad.numpy(), (0, 2, 3, 1)), rtol=1e-6, atol=1e-6)


def test_pool_forward_matches_reduce_window_odd():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 25, 25, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                  np.asarray(_pool_reduce_window(x)))
