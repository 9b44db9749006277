"""Probe (round-4 verdict item): BN-stats epilogue at the NATIVE layout.

The round-3 pair-packed kernels fused BN stats into the conv epilogue but
were only ever measured wrapped in pack_wp/unpack_wp relayouts that ate the
fusion win. This probe measures the one unfalsified lever: a Pallas conv
that KEEPS the block-diagonal 128-lane channel-stacked layout (no
pack/unpack at the boundaries) and fuses the stats accumulation
(ops/pallas_conv_bd.py), A/B'd in-graph against the production
formulation (XLA stacked conv + separate per-lane stats pass) at the three
512^2 stacked sites of the Onet forward:

  inc.conv2   [8, 512, 512, 128] x bd2 [3,3,128,128]
  up4.conv1   two-input concat(skip, up), each [8, 512, 512, 128]
  up4.conv2   [8, 512, 512, 128] x bd2 [3,3,128,128]

Each side runs as ONE jitted graph chaining the site conv -> normalized
stats -> a consumer reduction (so XLA can't DCE either the conv output or
the stats), matching how _bn_train consumes them in the train step.

    PYTHONPATH=. python runs/bd_epilogue_probe.py

Writes runs/bd_epilogue.json.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.cache import enable_compilation_cache
from onet_tpu.models.layers import bd2
from onet_tpu.ops.pallas_conv_bd import (
    conv3x3_bd_raw, conv3x3_bd2in_raw, xla_conv_stats)

enable_compilation_cache()

B, H, W = 8, 512, 512
ITERS = 20
NPIX = B * H * W


def _sync(y):
    float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))


def timeit(fn, *args):
    y = fn(*args)
    _sync(y)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = fn(*args)
        _sync(y)
        times.append((time.perf_counter() - t0) / ITERS)
    return min(times)


def _consume(y, s1, s2):
    """Mimic _bn_train's consumption: batch mean/var from the lane sums,
    then a scalar that touches the normalized output (anti-DCE)."""
    mean = jnp.sum(s1, axis=0) / NPIX
    var = jnp.sum(s2, axis=0) / NPIX - jnp.square(mean)
    yn = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    return jnp.sum(yn[:, ::64, ::64, :])


def main():
    k = jax.random.split(jax.random.key(0), 2)
    x = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, H, W, 128), jnp.bfloat16))(k[0])
    xb = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, H, W, 128), jnp.bfloat16))(k[1])
    rng = np.random.default_rng(0)

    def mkw():
        return bd2(jnp.asarray(
            rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.05,
            dtype=jnp.bfloat16))

    w1, wa, wb = mkw(), mkw(), mkw()
    out = {"shape": [B, H, W, 128], "iters": ITERS, "sites": {}}

    # ---- single-input site (inc.conv2 / up4.conv2) -----------------------
    @jax.jit
    def site1_xla(x, w):
        return _consume(*xla_conv_stats(x, w))

    t_xla = timeit(site1_xla, x, w1)

    row = {"xla_conv_plus_stats_ms": round(t_xla * 1e3, 3), "pallas_ms": {}}
    for rblk in (16, 32, 64):
        @jax.jit
        def site1_pl(x, w, rblk=rblk):
            return _consume(*conv3x3_bd_raw(x, w, rblk=rblk, stats=True))
        try:
            t = timeit(site1_pl, x, w1)
            row["pallas_ms"][str(rblk)] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001 — record OOM/lowering fails
            row["pallas_ms"][str(rblk)] = f"error: {type(e).__name__}"
    out["sites"]["single_128"] = row

    # numerics cross-check on chip at full size
    y_p, s1_p, s2_p = jax.jit(
        lambda x, w: conv3x3_bd_raw(x, w, rblk=16, stats=True))(x, w1)
    y_r, s1_r, s2_r = jax.jit(xla_conv_stats)(x, w1)
    row["max_abs_y_diff"] = float(jnp.max(jnp.abs(
        y_p.astype(jnp.float32) - y_r.astype(jnp.float32))))
    row["rel_s2_diff"] = float(jnp.max(jnp.abs(s2_p - s2_r)
                                       / (jnp.abs(s2_r) + 1e-3)))

    # ---- two-input site (up4.conv1) --------------------------------------
    @jax.jit
    def site2_xla(xa_, xb_, wa_, wb_):
        xcat = jnp.concatenate([xa_, xb_], axis=-1)
        wcat = jnp.concatenate([wa_, wb_], axis=2)
        return _consume(*xla_conv_stats(xcat, wcat))

    t_xla2 = timeit(site2_xla, x, xb, wa, wb)
    row2 = {"xla_conv_plus_stats_ms": round(t_xla2 * 1e3, 3),
            "pallas_ms": {}}
    for rblk in (16, 32):
        @jax.jit
        def site2_pl(xa_, xb_, wa_, wb_, rblk=rblk):
            return _consume(*conv3x3_bd2in_raw(
                xa_, xb_, wa_, wb_, rblk=rblk, stats=True))
        try:
            t = timeit(site2_pl, x, xb, wa, wb)
            row2["pallas_ms"][str(rblk)] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            row2["pallas_ms"][str(rblk)] = f"error: {type(e).__name__}"
    out["sites"]["two_input_256"] = row2

    # ---- decomposition: what does the separate stats pass cost XLA? ------
    @jax.jit
    def conv_only(x, w):
        y, _, _ = xla_conv_stats(x, w)
        return jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))

    out["xla_conv_only_ms"] = round(timeit(conv_only, x, w1) * 1e3, 3)

    print(json.dumps(out, indent=1))
    with open("runs/bd_epilogue.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
