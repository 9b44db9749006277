"""Batch-size sweep for the train and folded-infer graphs on the real chip.

XLA's layout choices at 512^2 are strongly batch-dependent (round 2 found
infer 66 -> 164 t/s going b=8 -> 32); re-sweep after each graph change.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step

TILE, ITERS = 512, 8


def time_train(batch):
    params, bn = onet_init(jax.random.key(1981), 1)
    opt = adam_init(params)
    step = make_train_step(policy=BF16_COMPUTE)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (batch, TILE, TILE, 1)).astype(np.float32))
    try:
        params, bn, opt, loss = step(params, bn, opt, x, 1e-5)
        float(loss)
    except Exception as e:
        print(f"train b={batch}: FAILED ({type(e).__name__})", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            params, bn, opt, loss = step(params, bn, opt, x, 1e-5)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"train b={batch}: {best*1e3:7.1f} ms  {batch/best:6.1f} tiles/s",
          flush=True)


def time_infer(batch):
    params, bn = onet_init(jax.random.key(1981), 1)
    folded = jax.jit(fold_onet)(params, bn)

    @jax.jit
    def infer_step(folded, x):
        _, labels = onet_infer(folded, x, policy=BF16_COMPUTE)
        return labels

    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(0, 1, (batch, TILE, TILE, 1)).astype(np.float32))
    try:
        mask = infer_step(folded, x)
        float(mask.sum())
    except Exception as e:
        print(f"infer b={batch}: FAILED ({type(e).__name__})", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for _ in range(ITERS):
            acc = acc + infer_step(folded, x).sum()
        float(acc)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"infer b={batch}: {best*1e3:7.1f} ms  {batch/best:6.1f} tiles/s",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    batches = [int(b) for b in sys.argv[2:]] or None
    if mode in ("train", "both"):
        for b in batches or (8, 10, 12, 14):
            time_train(b)
    if mode in ("infer", "both"):
        for b in batches or (32, 40, 48, 64):
            time_infer(b)
