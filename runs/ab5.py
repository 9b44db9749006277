"""A/B: decoder conv1 on concat(skip, up) (current) vs weight-split
conv(skip, Ws) + conv(up, Wu) — kills the concat forward and its backward
split (1.6 ms at the up4 level)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models import layers as L
from onet_tpu.models import unet as U
from onet_tpu.models import onet as O
from onet_tpu.train.optim import adam_init, adam_update

TILE, BATCH, ITERS = 512, 8, 10


def patch_up4_split(on: bool):
    """Monkeypatch unet_apply_stacked's up4 conv1 formulation."""
    orig = U.unet_apply_stacked
    if not on:
        return orig

    def patched(params, state, x, *, train, policy=None, reshard=None,
                ops=U.DEFAULT_OPS):
        # re-implement with the split conv at up4.conv1
        import types
        rs = reshard or (lambda tag, t: t)
        new_state = {}
        b = x.shape[0]
        p, s = params["inc"], state["inc"]
        h = ops.conv3x3(x, L.bd2(p["conv1"]["w"]), policy=policy)
        h, s1 = ops.batch_norm(h, p["bn1"], s["bn1"], train=train, groups=2,
                               stacked=True)
        h = L.relu(h)
        h = ops.conv3x3(h, L.bd2(p["conv2"]["w"]), policy=policy)
        h, s2 = ops.batch_norm(h, p["bn2"], s["bn2"], train=train, groups=2,
                               stacked=True)
        x1s = L.relu(h)
        new_state["inc"] = {"bn1": s1, "bn2": s2}
        hp = ops.max_pool(x1s)
        c = x1s.shape[-1] // 2
        p1, s1d = params["down1"], state["down1"]
        h = ops.conv3x3(hp, L.bd2(p1["conv1"]["w"]), policy=policy)
        h, s1 = ops.batch_norm(h, p1["bn1"], s1d["bn1"], train=train,
                               groups=2, stacked=True)
        h = L.relu(h)
        c1 = h.shape[-1] // 2
        xb = jnp.concatenate([h[..., :c1], h[..., c1:]], axis=0)
        xb = ops.conv3x3(xb, p1["conv2"]["w"], policy=policy)
        xb, s2 = ops.batch_norm(xb, p1["bn2"], s1d["bn2"], train=train,
                                groups=2)
        x2 = L.relu(xb)
        new_state["down1"] = {"bn1": s1, "bn2": s2}
        x3, new_state["down2"] = U._down(params["down2"], state["down2"], x2,
                                         train=train, groups=2, policy=policy,
                                         ops=ops)
        x3 = rs("deep", x3)
        x4, new_state["down3"] = U._down(params["down3"], state["down3"], x3,
                                         train=train, groups=2, policy=policy,
                                         ops=ops)
        x5, new_state["down4"] = U._down(params["down4"], state["down4"], x4,
                                         train=train, groups=2, policy=policy,
                                         ops=ops)
        y4, new_state["up1"] = U._up(params["up1"], state["up1"], x5, x4,
                                     train=train, groups=2, policy=policy,
                                     ops=ops)
        y3, new_state["up2"] = U._up(params["up2"], state["up2"], y4, x3,
                                     train=train, groups=2, policy=policy,
                                     ops=ops)
        y2, new_state["up3"] = U._up(params["up3"], state["up3"], y3, x2,
                                     train=train, groups=2, policy=policy,
                                     ops=ops)
        y2 = rs("shallow", y2)
        y2s = jnp.concatenate([y2[:b], y2[b:]], axis=-1)
        up, sc = params["up4"], state["up4"]["conv"]
        u = ops.conv_transpose(y2s, L.bd2(up["up"]["w"]),
                               jnp.tile(up["up"]["b"], 2), policy=policy)
        pc = up["conv"]
        w = pc["conv1"]["w"]
        ws, wu = w[:, :, :c, :], w[:, :, c:, :]
        # split conv: no concat materialization, no backward split
        h = (ops.conv3x3(x1s, L.bd2(ws), policy=policy)
             + ops.conv3x3(u, L.bd2(wu), policy=policy))
        h, s1 = ops.batch_norm(h, pc["bn1"], sc["bn1"], train=train,
                               groups=2, stacked=True)
        h = L.relu(h)
        h = ops.conv3x3(h, L.bd2(pc["conv2"]["w"]), policy=policy)
        h, s2 = ops.batch_norm(h, pc["bn2"], sc["bn2"], train=train,
                               groups=2, stacked=True)
        y1s = L.relu(h)
        new_state["up4"] = {"conv": {"bn1": s1, "bn2": s2}}
        return (x1s, y1s), new_state

    return patched


def main():
    modes = sys.argv[1:] or ["concat", "split"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (BATCH, TILE, TILE, 1)).astype(np.float32))
    orig = U.unet_apply_stacked
    for mode in modes:
        U.unet_apply_stacked = patch_up4_split(mode == "split")
        O.unet_apply_stacked = U.unet_apply_stacked

        def train_step(params, bn_state, opt_state, xb, lr):
            def loss_fn(p):
                out, new_bn = O.onet_forward(p, bn_state, xb, train=True,
                                             policy=BF16_COMPUTE)
                return O.compute_loss(out), new_bn
            (loss, new_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
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
        print(f"{mode:6s} {best*1e3:8.2f} ms/step  {BATCH/best:6.1f} tiles/s"
              f"  loss={float(loss):.6f}", flush=True)
    U.unet_apply_stacked = orig
    O.unet_apply_stacked = orig


if __name__ == "__main__":
    main()
