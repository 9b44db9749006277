"""Serving batch-size frontier above 32: does bf16/int8 inference keep
scaling at b=48/64 (512^2 tiles)? Round 2 measured 16/24/32 and took 32;
this closes the top end. Run: PYTHONPATH=.:$PYTHONPATH python
runs/infer_batch_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init
from onet_tpu.models.quant import calibrate, onet_infer_q, quantize_folded

TILE = 512
ITERS = 10


def rate(fn, m, x, batch):
    acc = fn(m, x)[1].sum()
    float(acc)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for _ in range(ITERS):
            acc = acc + fn(m, x)[1].sum()
        float(acc)
        best = max(best, batch * ITERS / (time.perf_counter() - t0))
    return best


def main():
    params, bn = jax.jit(lambda k: onet_init(k, 1))(jax.random.key(1981))
    folded = jax.jit(fold_onet)(params, bn)
    infer = jax.jit(lambda f, xb: onet_infer(f, xb, policy=BF16_COMPUTE))
    infer_q = jax.jit(lambda q, xb: onet_infer_q(q, xb, head_bf16=False))

    xc = jax.jit(lambda k: jax.random.uniform(
        k, (8, TILE, TILE, 1), jnp.float32))(jax.random.key(0))
    scales = calibrate(folded, xc)
    q = quantize_folded(folded, scales)

    for batch in (32, 48, 64):
        x = jax.jit(lambda k, b=batch: jax.random.uniform(
            k, (b, TILE, TILE, 1), jnp.float32))(jax.random.key(batch))
        try:
            r = rate(infer, folded, x, batch)
            print(f"bf16 b={batch}: {r:7.1f} t/s")
        except Exception as e:
            print(f"bf16 b={batch}: {type(e).__name__}: {str(e)[:80]}")
        try:
            r = rate(infer_q, q, x, batch)
            print(f"int8 b={batch}: {r:7.1f} t/s")
        except Exception as e:
            print(f"int8 b={batch}: {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
