"""Benchmark: Onet train+infer throughput on 512x512 tiles.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The baseline target (BASELINE.json) is >= 2000 512^2 tiles/sec/chip
combined train+infer on a v5e-8; per-chip we report measured
tiles/sec/chip against the per-chip share (2000/8 = 250).

Method: jitted full train step (fused 2B complementary forward + backward
+ Adam, bf16 MXU policy) and jitted inference step, each timed over
``ITERS`` chained steps ending in a value fetch. NOTE: on the axon TPU
backend ``jax.block_until_ready`` does NOT synchronize — only a real
device->host transfer does — so every timing section closes with
``float(...)`` on a scalar that data-depends on the whole chain.
Throughput counts input tiles processed per second; the combined number is
the harmonic mean of train and infer rates weighted 1:1.
"""

import json
import time

import numpy as np

import jax

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init, onet_forward, compute_loss, predict_label
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step

TILE = 512
BATCH = 8
ITERS = 20
BASELINE_PER_CHIP = 2000.0 / 8.0


def main():
    params, bn_state = onet_init(jax.random.key(1981), 1)
    opt_state = adam_init(params)
    train_step = make_train_step(policy=BF16_COMPUTE)

    @jax.jit
    def infer_step(params, bn_state, x):
        out, _ = onet_forward(params, bn_state, x, train=False,
                              policy=BF16_COMPUTE)
        return predict_label(out.S)

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))

    # warmup / compile (float() forces a true sync on axon)
    params, bn_state, opt_state, loss = train_step(params, bn_state,
                                                   opt_state, x, 1e-5)
    mask = infer_step(params, bn_state, x)
    float(loss), float(mask.sum())

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, bn_state, opt_state, loss = train_step(params, bn_state,
                                                       opt_state, x, 1e-5)
    loss_v = float(loss)  # data-depends on all ITERS chained steps
    train_rate = BATCH * ITERS / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    acc = 0
    for _ in range(ITERS):
        mask = infer_step(params, bn_state, x)
        acc = acc + mask.sum()  # chain so the final fetch syncs every step
    float(acc)
    infer_rate = BATCH * ITERS / (time.perf_counter() - t0)

    combined = 2.0 / (1.0 / train_rate + 1.0 / infer_rate)
    print(json.dumps({
        "metric": "onet_512tile_throughput_per_chip",
        "value": round(combined, 2),
        "unit": "tiles/sec/chip (train+infer harmonic mean)",
        "vs_baseline": round(combined / BASELINE_PER_CHIP, 3),
        "detail": {"train_tiles_per_s": round(train_rate, 2),
                   "infer_tiles_per_s": round(infer_rate, 2),
                   "batch": BATCH, "tile": TILE,
                   "loss": loss_v},
    }))


if __name__ == "__main__":
    main()
