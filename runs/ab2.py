"""A/B: JSD-loss formulation x conv-transpose dw formulation, full train
step on the real chip."""
import functools
import itertools
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
from onet_tpu.ops.math import log1pexp

TILE, BATCH, ITERS = 512, 8, 10


def loss_old(out):
    ct, cd = out.Lsum[..., 0], out.Lsum[..., 1]
    st, sd = out.S[..., 0], out.S[..., 1]
    jt = -jnp.mean(log1pexp(-ct * st)) - jnp.mean(log1pexp(ct * sd))
    jd = -jnp.mean(log1pexp(-cd * sd)) - jnp.mean(log1pexp(cd * st))
    return -(jt + jd) / 2.0


def loss_rev(out):
    return (jnp.mean(log1pexp(-out.Lsum * out.S))
            + jnp.mean(log1pexp(out.Lsum * out.S[..., ::-1])))


def loss_comp(out):
    return (jnp.mean(log1pexp(-out.Lsum * out.S))
            + jnp.mean(log1pexp(out.Lsum * (1.0 - out.S))))


LOSSES = {"old": loss_old, "rev": loss_rev, "comp": loss_comp}


def make_ct_core(dw_mode):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def core(x, w, precision):
        return lax.conv_transpose(
            x, w[::-1, ::-1], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)

    def fwd(x, w, precision):
        return core(x, w, precision), (x, w)

    def bwd(precision, res, g):
        x, w = res
        dx = lax.conv_general_dilated(
            g, jnp.transpose(w, (0, 1, 3, 2)), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
            preferred_element_type=jnp.float32).astype(x.dtype)
        if dw_mode == "slices":
            slabs = []
            for di in (0, 1):
                row = []
                for dj in (0, 1):
                    gs = g[:, di::2, dj::2, :]
                    row.append(lax.dot_general(
                        x, gs, (((0, 1, 2), (0, 1, 2)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32))
                slabs.append(jnp.stack(row, axis=0))
            dw = jnp.stack(slabs, axis=0).astype(w.dtype)
        else:
            n, h, w_sp, c = x.shape
            o = g.shape[-1]
            g6 = g.reshape(n, h, 2, w_sp, 2, o)
            dw = lax.dot_general(
                x, g6, (((0, 1, 2), (0, 1, 3)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
        return dx, dw

    core.defvjp(fwd, bwd)
    return core


def main():
    combos = sys.argv[1:] or ["old_slices", "old_dot", "comp_slices",
                              "comp_dot"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
    for combo in combos:
        lname, dwname = combo.rsplit("_", 1)
        L._conv_transpose_core = make_ct_core(dwname)
        loss_fn_v = LOSSES[lname]

        def fwd_loss(p, bn, xb):
            out, new_bn = O.onet_forward(p, bn, xb, train=True,
                                         policy=BF16_COMPUTE)
            return loss_fn_v(out), new_bn

        def train_step(params, bn_state, opt_state, xb, lr):
            (loss, new_bn), grads = jax.value_and_grad(
                fwd_loss, has_aux=True)(params, bn_state, xb)
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
        print(f"{combo:12s} {best*1e3:8.2f} ms/step  "
              f"{BATCH/best:6.1f} tiles/s  loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
