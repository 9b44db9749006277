"""A/B: pair-packed Pallas conv vs the XLA block-diagonal stacked conv.

Shapes = the Onet's 64-channel 512^2 levels at the bench batch (b=8
frames -> 16 branch-samples). Timing closes with a device->host fetch
(axon's block_until_ready is a no-op). Run on the real TPU chip:

    PYTHONPATH=. python runs/pallas_conv_bench.py [rblk ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import onet_tpu.ops.pallas_conv as PC
from onet_tpu.models.layers import bd2

B, H, W, C = 8, 512, 512, 64
ITERS = 20


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


def _sync(y):
    y = jax.tree.leaves(y)[0]
    float(jnp.sum(y.astype(jnp.float32)).astype(jnp.float32))


def main():
    rblks = [int(a) for a in sys.argv[1:]] or [16]
    rng = np.random.default_rng(0)
    # device-side generation: a 1 GB host->device feed crawls on the tunnel
    k = jax.random.key(0)
    x_st = jax.jit(lambda k: jax.random.normal(
        k, (B, H, W, 2 * C), jnp.bfloat16))(k)
    x_wp = jax.jit(lambda k: jax.random.normal(
        k, (2 * B, H, W // 2, 2 * C), jnp.bfloat16))(k)
    w = jnp.asarray((rng.normal(size=(3, 3, C, C)) * 0.05).astype(np.float32))
    useful_tf = 2 * B * H * W * 9 * C * C * 2 / 1e12  # both branches

    # --- XLA block-diagonal stacked (today's form) -------------------------
    @jax.jit
    def xla_bd(x, w):
        return lax.conv_general_dilated(
            x, bd2(w.astype(jnp.bfloat16)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timeit(xla_bd, x_st, w)
    print(f"xla bd2 fwd:        {t * 1e3:7.3f} ms   useful {useful_tf / t:6.1f} TF/s")

    # chained-in-jit variants: one dispatch for CHAIN conv applications
    # (isolates device time from tunnel dispatch latency)
    CHAIN = 10

    @jax.jit
    def xla_bd_chain(x, w):
        wb = bd2(w.astype(jnp.bfloat16))
        def body(_, xx):
            y = lax.conv_general_dilated(
                xx, wb, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y * 0.1
        return lax.fori_loop(0, CHAIN, body, x)

    t = timeit(xla_bd_chain, x_st, w)
    print(f"xla bd2 chain:      {t / CHAIN * 1e3:7.3f} ms   useful {useful_tf / (t / CHAIN):6.1f} TF/s")

    # --- Pallas pair-packed ------------------------------------------------
    for rblk in rblks:
        @jax.jit
        def pl_fwd(x, w, rblk=rblk):
            wc, we = PC.make_wc_we(w, dtype=x.dtype)
            return PC.conv3x3_wp_raw(x, wc, we, rblk=rblk, stats=False)

        t = timeit(pl_fwd, x_wp, w)
        print(f"pallas fwd r{rblk:<3d}:    {t * 1e3:7.3f} ms   useful {useful_tf / t:6.1f} TF/s")

        @jax.jit
        def pl_chain(x, w, rblk=rblk):
            wc, we = PC.make_wc_we(w, dtype=x.dtype)
            def body(_, xx):
                y = PC.conv3x3_wp_raw(xx, wc, we, rblk=rblk, stats=False)
                return y * 0.1
            return lax.fori_loop(0, CHAIN, body, x)

        t = timeit(pl_chain, x_wp, w)
        print(f"pallas chain r{rblk:<3d}:  {t / CHAIN * 1e3:7.3f} ms   useful {useful_tf / (t / CHAIN):6.1f} TF/s")

        @jax.jit
        def pl_fwd_stats(x, w, rblk=rblk):
            wc, we = PC.make_wc_we(w, dtype=x.dtype)
            return PC.conv3x3_wp_raw(x, wc, we, rblk=rblk, stats=True)

        t = timeit(pl_fwd_stats, x_wp, w)
        print(f"pallas fwd+stats r{rblk:<3d}: {t * 1e3:6.3f} ms   useful {useful_tf / t:6.1f} TF/s")

        @jax.jit
        def pl_dw(x, dy, rblk=rblk):
            return PC.conv3x3_wp_dw(x, dy, rblk=rblk)

        t = timeit(pl_dw, x_wp, x_wp)
        print(f"pallas dw r{rblk:<3d}:     {t * 1e3:7.3f} ms   useful {useful_tf / t:6.1f} TF/s")

    # --- XLA stacked-BN stats pass, for the fusion-saving context ----------
    @jax.jit
    def xla_stats(y):
        yf = y.astype(jnp.float32)
        return jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(jnp.square(yf), axis=(0, 1, 2))

    t = timeit(xla_stats, x_st)
    print(f"xla separate stats: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
