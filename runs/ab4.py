"""A/B: JSD loss via jax AD (current) vs a custom VJP that saves only
(Lsum, S) and recomputes the sigmoid terms — the AD version materializes
four f32[B,H,W,1] residuals in a pathological {0,2,1,3} layout (fusion at
20 GiB/s, ~3 ms/step)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models import onet as O
from onet_tpu.ops.math import log1pexp
from onet_tpu.train.optim import adam_init, adam_update

TILE, BATCH, ITERS = 512, 8, 10


@jax.custom_vjp
def loss_cv(lsum, s):
    lt, ld = lsum[..., 0], lsum[..., 1]
    st, sd = s[..., 0], s[..., 1]
    a = jnp.mean(log1pexp(-lt * st))
    b = jnp.mean(log1pexp(lt * sd))
    c = jnp.mean(log1pexp(-ld * sd))
    d = jnp.mean(log1pexp(ld * st))
    return (a + b + c + d) / 2.0


def _cv_fwd(lsum, s):
    return loss_cv(lsum, s), (lsum, s)


def _cv_bwd(res, g):
    lsum, s = res
    lt, ld = lsum[..., 0], lsum[..., 1]
    st, sd = s[..., 0], s[..., 1]
    n = lt.size
    k = g / (2.0 * n)
    sig_a = jax.nn.sigmoid(-lt * st)
    sig_b = jax.nn.sigmoid(lt * sd)
    sig_c = jax.nn.sigmoid(-ld * sd)
    sig_d = jax.nn.sigmoid(ld * st)
    dlt = k * (-sig_a * st + sig_b * sd)
    dld = k * (-sig_c * sd + sig_d * st)
    dst = k * (-sig_a * lt + sig_d * ld)
    dsd = k * (sig_b * lt - sig_c * ld)
    return jnp.stack([dlt, dld], -1), jnp.stack([dst, dsd], -1)


loss_cv.defvjp(_cv_fwd, _cv_bwd)


def make_step(mode):
    def loss_of(out):
        if mode == "ad":
            return O.compute_loss(out)
        return loss_cv(out.Lsum, out.S)

    def train_step(params, bn_state, opt_state, x, lr):
        def loss_fn(p):
            out, new_bn = O.onet_forward(p, bn_state, x, train=True,
                                         policy=BF16_COMPUTE)
            return loss_of(out), new_bn
        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def main():
    modes = sys.argv[1:] or ["ad", "cv"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
    for mode in modes:
        step = make_step(mode)
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
        print(f"{mode:4s} {best*1e3:8.2f} ms/step  {BATCH/best:6.1f} tiles/s"
              f"  loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
