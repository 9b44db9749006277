"""A/B: BN train backward reading the conv output x (current) vs
reconstructing xhat from the BN OUTPUT y (which the following ReLU's
backward already reads — sharing the residual saves one full activation
read per BN site in the backward)."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models import layers as L
from onet_tpu.models import onet as O
from onet_tpu.train.optim import adam_init, adam_update

TILE, BATCH, ITERS = 512, 8, 10


def make_bn_ch_from_y():
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def bn(x, scale, bias, groups, eps):
        y, mean, var, _ = L._bn_train_ch_fwd_impl(x, scale, bias, groups, eps)
        return y, mean, var

    def fwd(x, scale, bias, groups, eps):
        y, mean, var, inv = L._bn_train_ch_fwd_impl(x, scale, bias, groups,
                                                    eps)
        return (y, mean, var), (y, scale, bias, inv)

    def bwd(groups, eps, res, cts):
        dy, _dm, _dv = cts
        y, scale, bias, inv = res
        n, h, w, c2 = y.shape
        c = c2 // groups
        cnt = n * h * w
        scale2 = jnp.tile(scale.astype(jnp.float32), groups)
        bias2 = jnp.tile(bias.astype(jnp.float32), groups)
        safe = jnp.where(jnp.abs(scale2) < 1e-6,
                         jnp.where(scale2 < 0, -1e-6, 1e-6), scale2)
        yf = y.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        xhat = (yf - bias2) / safe
        sum_dy = jnp.sum(dyf, axis=(0, 1, 2))
        sum_dy_xhat = jnp.sum(dyf * xhat, axis=(0, 1, 2))
        dx = ((inv * scale2)
              * (dyf - sum_dy / cnt - xhat * (sum_dy_xhat / cnt))
              ).astype(y.dtype)
        dscale = jnp.sum(sum_dy_xhat.reshape(groups, c), axis=0
                         ).astype(scale.dtype)
        dbias = jnp.sum(sum_dy.reshape(groups, c), axis=0
                        ).astype(scale.dtype)
        return dx, dscale, dbias

    bn.defvjp(fwd, bwd)
    return bn


def main():
    modes = sys.argv[1:] or ["default", "from_y"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
    orig = L._bn_train_ch
    for mode in modes:
        L._bn_train_ch = orig if mode == "default" else make_bn_ch_from_y()

        def train_step(params, bn_state, opt_state, xb, lr):
            def loss_fn(p):
                out, new_bn = O.onet_forward(p, bn_state, xb, train=True,
                                             policy=BF16_COMPUTE)
                return O.compute_loss(out), new_bn
            (loss, new_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = adam_update(grads, opt_state, lr)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, new_bn, opt_state, loss

        step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        params, bn = O.onet_init(jax.random.key(1981), 1)
        opt = adam_init(params)
        p, b, o_, loss = step(params, bn, opt, x, 1e-5)
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                p, b, o_, loss = step(p, b, o_, x, 1e-5)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{mode:8s} {best*1e3:8.2f} ms/step  {BATCH/best:6.1f} tiles/s"
              f"  loss={float(loss):.6f}", flush=True)
    L._bn_train_ch = orig


if __name__ == "__main__":
    main()
