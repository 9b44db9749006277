"""Round-2+ profiling driver: trace train + infer steps, print breakdowns."""
import json
import sys

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
from onet_tpu.utils.profiling import trace, hlo_breakdown, category_breakdown

TILE, BATCH, INFER_BATCH = 512, 8, 32

which = sys.argv[1] if len(sys.argv) > 1 else "train"

params, bn_state = onet_init(jax.random.key(1981), 1)
opt_state = adam_init(params)
train_step = make_train_step(policy=BF16_COMPUTE)


@jax.jit
def infer_step(folded, x):
    _, labels = onet_infer(folded, x, policy=BF16_COMPUTE)
    return labels


x = jnp.asarray(np.random.default_rng(0)
                .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
xi = jnp.asarray(np.random.default_rng(1)
                 .uniform(0, 1, (INFER_BATCH, TILE, TILE, 1)).astype(np.float32))

params, bn_state, opt_state, loss = train_step(params, bn_state, opt_state, x, 1e-5)
folded = jax.jit(fold_onet)(params, bn_state)
mask = infer_step(folded, xi)
float(loss), float(mask.sum())

logdir = f"/tmp/prof_{which}"
with trace(logdir):
    if which == "train":
        for _ in range(3):
            params, bn_state, opt_state, loss = train_step(
                params, bn_state, opt_state, x, 1e-5)
        float(loss)
    else:
        for _ in range(3):
            mask = infer_step(folded, xi)
        float(mask.sum())

rows = hlo_breakdown(logdir, top=30)
cats = category_breakdown(logdir)
print(json.dumps(cats, indent=1))
for r in rows:
    print(f"{r['total_ms']/3:8.3f} ms  {r['category']:<28} {r['bound_by']:<8} "
          f"{r['gflops_per_s']:9.0f} GF/s {r['bw_gib_per_s']:8.0f} GiB/s  {r['name']}")
