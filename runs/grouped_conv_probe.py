"""Probe: does XLA/libtpu lower feature_group_count=2 convs at half FLOPs?

The train graph's 64-channel-per-branch levels run as dense 128-lane convs
with block-diagonal weights (models/layers.py::bd2) — 2x useful FLOPs.
A grouped conv (feature_group_count=2, 64 ch/group) is the SAME math with
the structure declared to the compiler. If libtpu lowers it without
lane-padding each group, the 2x tax dies with zero custom kernels.

    PYTHONPATH=. python runs/grouped_conv_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 8, 512, 512, 64
ITERS = 20
DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def _sync(y):
    float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))


def timeit(fn, *args):
    y = fn(*args)
    _sync(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = fn(*args)
        _sync(y)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    k = jax.random.key(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (B, H, W, 2 * C), jnp.bfloat16))(k)          # channel-stacked
    xb = jax.jit(lambda k: jax.random.normal(
        k, (2 * B, H, W, C), jnp.bfloat16))(k)          # batch-stacked
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05,
                    dtype=jnp.bfloat16)
    # block-diagonal [3,3,128,128]
    z = jnp.zeros_like(w)
    wbd = jnp.concatenate([
        jnp.concatenate([w, z], axis=3),
        jnp.concatenate([z, w], axis=3)], axis=2)
    # grouped [3,3,64,128]: out channels [0:64] from group 0, [64:128] group 1
    wg = jnp.concatenate([w, w], axis=3)

    conv = lambda x, w, g: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN, feature_group_count=g)

    f_bd = jax.jit(lambda x, w: conv(x, w, 1))
    f_gr = jax.jit(lambda x, w: conv(x, w, 2))
    f_bs = jax.jit(lambda x, w: conv(x, w, 1))

    # exactness: grouped == block-diagonal
    y_bd = f_bd(x, wbd)
    y_gr = f_gr(x, wg)
    err = float(jnp.max(jnp.abs(y_bd.astype(jnp.float32) -
                                y_gr.astype(jnp.float32))))
    useful_tf = 2 * B * H * W * 9 * C * C * 2 / 1e12

    t_bd = timeit(f_bd, x, wbd)
    t_gr = timeit(f_gr, x, wg)
    t_bs = timeit(f_bs, xb, w)

    print(f"max |grouped - blockdiag| = {err:.3e}")
    print(f"useful TFLOP/call = {useful_tf:.4f}")
    for name, t in [("block-diagonal dense 128-lane", t_bd),
                    ("feature_group_count=2", t_gr),
                    ("batch-stacked 64-lane", t_bs)]:
        print(f"{name:32s} {t*1e3:8.3f} ms   {useful_tf/t:7.1f} useful TF/s")


if __name__ == "__main__":
    main()
