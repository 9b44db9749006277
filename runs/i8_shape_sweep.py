"""Per-shape int8-vs-bf16 conv A/B over every distinct conv shape of the
train graph (the round-3 int8-neutrality root cause; RESULTS.md).
Run: PYTHONPATH=.:$PYTHONPATH python runs/i8_shape_sweep.py
"""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
D = ("NHWC", "HWIO", "NHWC")
def timeit(fn, *a):
    y = fn(*a); float(jnp.sum(y.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(8): y = fn(*a)
        float(jnp.sum(y.astype(jnp.float32)))
        best=min(best,(time.perf_counter()-t0)/8)
    return best

k = jax.random.key(0)
# every distinct conv shape in the 512^2 stacked train graph (B=8):
# stacked shallow convs carry bd2 weights (128/256 lanes); batched deep 2B=16
SHAPES = [
    (8, 512, 128, 128),   # inc.conv2 / up4.conv2 (bd2)
    (8, 256, 128, 256),   # down1.conv1 (bd2)
    (16, 256, 128, 128),  # down1.conv2 (batched)
    (16, 128, 128, 256),  # down2.conv1
    (16, 128, 256, 256),  # down2.conv2
    (16, 64, 256, 512),   # down3.conv1
    (16, 64, 512, 512),   # down3.conv2
    (16, 32, 512, 1024),  # down4.conv1
    (16, 32, 1024, 1024), # down4.conv2
    (16, 64, 1024, 512),  # up1.conv1
    (16, 128, 512, 256),  # up2.conv1
    (16, 256, 256, 128),  # up3.conv1
    (8, 512, 256, 128),   # up4.conv1 (bd2_skip_up)
]
for (B,H,C1,C2) in SHAPES:
    xb = jax.jit(lambda k: jax.random.normal(k,(B,H,H,C1),jnp.bfloat16))(k)
    wb = jax.jit(lambda k: jax.random.normal(k,(3,3,C1,C2),jnp.bfloat16))(k)
    xq = jax.jit(lambda k: jax.random.randint(k,(B,H,H,C1),-127,127,jnp.int8))(k)
    wq = jax.jit(lambda k: jax.random.randint(k,(3,3,C1,C2),-127,127,jnp.int8))(k)
    f_bf = jax.jit(lambda x,w: lax.conv_general_dilated(x,w,(1,1),"SAME",dimension_numbers=D))
    f_i8 = jax.jit(lambda x,w: lax.conv_general_dilated(x,w,(1,1),"SAME",dimension_numbers=D,preferred_element_type=jnp.int32))
    tb = timeit(f_bf, xb, wb); ti = timeit(f_i8, xq, wq)
    print(f"[{B:2d},{H:3d},{C1:4d}->{C2:4d}] bf16 {tb*1e3:7.3f} | int8 {ti*1e3:7.3f} | ratio {tb/ti:.2f}x", flush=True)
