"""A/B head formulations for the stacked Onet head, measured in the full
train step on the real chip.

The round-2 profile showed onet.py:106-109 (f32 convert + [...,2,c] reshape
+ reduce) forcing XLA to materialize four f32[8,512,512,128] transposed
copies (~13 ms/step) plus oversized convert_reduce fusions.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models import onet as O
from onet_tpu.models.onet import onet_init, OnetOutput, compute_loss
from onet_tpu.models.unet import unet_apply_stacked, DEFAULT_OPS
from onet_tpu.ops.normalize import complement
from onet_tpu.train.optim import adam_init, adam_update

TILE, BATCH, ITERS = 512, 8, 10


def head_current(loc, glob):
    b, h, w, c2 = loc.shape
    c = c2 // 2
    locf = loc.astype(jnp.float32).reshape(b, h, w, 2, c)
    globf = glob.astype(jnp.float32).reshape(b, h, w, 2, c)
    v = jnp.sum(locf * globf, axis=-1)
    lsum = jnp.sum(locf, axis=-1)
    return v, lsum


def head_dot(loc, glob):
    c2 = loc.shape[-1]
    c = c2 // 2
    sel = jnp.zeros((c2, 2), jnp.float32).at[:c, 0].set(1.0).at[c:, 1].set(1.0)
    prod = loc.astype(jnp.float32) * glob.astype(jnp.float32)
    v = lax.dot_general(prod, sel, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    lsum = lax.dot_general(loc.astype(jnp.float32), sel,
                           (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    return v, lsum


def head_conv(loc, glob):
    c2 = loc.shape[-1]
    c = c2 // 2
    sel = jnp.zeros((1, 1, c2, 2), jnp.float32)
    sel = sel.at[0, 0, :c, 0].set(1.0).at[0, 0, c:, 1].set(1.0)
    prod = loc.astype(jnp.float32) * glob.astype(jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    v = lax.conv_general_dilated(prod, sel, (1, 1), "VALID",
                                 dimension_numbers=dn)
    lsum = lax.conv_general_dilated(loc.astype(jnp.float32), sel, (1, 1),
                                    "VALID", dimension_numbers=dn)
    return v, lsum


def head_slice(loc, glob):
    c = loc.shape[-1] // 2
    lf, gf = loc.astype(jnp.float32), glob.astype(jnp.float32)
    vt = jnp.sum(lf[..., :c] * gf[..., :c], axis=-1)
    vd = jnp.sum(lf[..., c:] * gf[..., c:], axis=-1)
    st = jnp.sum(lf[..., :c], axis=-1)
    sd = jnp.sum(lf[..., c:], axis=-1)
    return jnp.stack([vt, vd], -1), jnp.stack([st, sd], -1)


HEADS = {"current": head_current, "dot": head_dot, "conv": head_conv,
         "slice": head_slice}


def make_step(head_fn):
    def fwd(params, state, x):
        xd = complement(x, 0.0)
        xx = jnp.concatenate([x, xd], axis=-1)
        (loc, glob), new_top = unet_apply_stacked(
            params["top"], state["top"], xx, train=True, policy=BF16_COMPUTE,
            ops=DEFAULT_OPS)
        v, lsum = head_fn(loc, glob)
        s = jax.nn.softmax(v, axis=-1)
        c = loc.shape[-1] // 2
        out = OnetOutput(Lt=loc[..., :c], Ld=loc[..., c:],
                         Vt=v[..., 0], Vd=v[..., 1], S=s, Lsum=lsum)
        return out, {"top": new_top}

    def train_step(params, bn_state, opt_state, x, lr):
        def loss_fn(p):
            out, new_bn = fwd(p, bn_state, x)
            return compute_loss(out), new_bn
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def main():
    names = sys.argv[1:] or list(HEADS)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
    for name in names:
        params, bn = onet_init(jax.random.key(1981), 1)
        opt = adam_init(params)
        step = make_step(HEADS[name])
        p, b, o, loss = step(params, bn, opt, x, 1e-5)
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                p, b, o, loss = step(p, b, o, x, 1e-5)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:8s} {best*1e3:8.2f} ms/step  "
              f"{BATCH/best:6.1f} tiles/s  loss={float(loss):.6f}")


if __name__ == "__main__":
    main()
