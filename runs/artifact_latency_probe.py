"""Why does the exported serving artifact run ~1.8x slower than the live
jitted graph? A/B on the real chip:

  live      jax.jit(onet_infer)(folded, x)            (the serve baseline)
  baked     jax.export module with weights as CONSTANTS (what .onetx ships)
  as-args   jax.export module with weights as ARGUMENTS

If as-args matches live, the slowdown is XLA's handling of large module
constants (layout/donation freedom lost), and the artifact container
should ship weights beside the module instead of inside it. If as-args is
equally slow, the exported-call boundary itself is the cost.

Run: PYTHONPATH=.:$PYTHONPATH python runs/artifact_latency_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from jax import export as jexport
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init

B, HW = 8, 224
ITERS = 10


def timeit(fn, *args):
    y = fn(*args)
    float(jnp.sum(y[1].astype(jnp.float32)))   # real sync on axon
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for _ in range(ITERS):
            acc = acc + fn(*args)[1].sum()
        float(acc)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    params, bn = jax.jit(lambda k: onet_init(k, 1))(jax.random.key(1981))
    folded = jax.jit(fold_onet)(params, bn)
    x = jax.jit(lambda k: jax.random.uniform(
        k, (B, HW, HW, 1), jnp.float32))(jax.random.key(0))

    live = jax.jit(lambda f, xb: onet_infer(f, xb, policy=BF16_COMPUTE))
    t = timeit(live, folded, x)
    print(f"live jit:            {t * 1e3:7.1f} ms/batch")

    def fn_baked(xb):
        s, labels = onet_infer(folded, xb, policy=BF16_COMPUTE)
        return s.astype(jnp.float32), labels.astype(jnp.int32)

    spec = jax.ShapeDtypeStruct((B, HW, HW, 1), np.float32)
    exp = jexport.export(jax.jit(fn_baked), platforms=("tpu",))(spec)
    blob = exp.serialize()
    baked = jax.jit(jexport.deserialize(blob).call)
    t = timeit(baked, x)
    print(f"exported, baked:     {t * 1e3:7.1f} ms/batch "
          f"({len(blob) / 1e6:.1f} MB)")

    def fn_args(f, xb):
        s, labels = onet_infer(f, xb, policy=BF16_COMPUTE)
        return s.astype(jnp.float32), labels.astype(jnp.int32)

    fspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), folded)
    exp2 = jexport.export(jax.jit(fn_args), platforms=("tpu",))(fspec, spec)
    blob2 = exp2.serialize()
    asargs = jax.jit(jexport.deserialize(blob2).call)
    t = timeit(lambda xb: asargs(folded, xb), x)
    print(f"exported, as-args:   {t * 1e3:7.1f} ms/batch "
          f"({len(blob2) / 1e6:.1f} MB module)")


if __name__ == "__main__":
    main()
