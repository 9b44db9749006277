"""Profiling utilities (utils/profiling.py): StepTimer sync semantics and
the trace context produce a readable xplane (hlo_breakdown returns [] when
the xprof converter is unavailable — both branches accepted)."""

import glob
import os

import jax
import jax.numpy as jnp

from onet_tpu.utils.profiling import (
    StepTimer, trace, hlo_breakdown, category_breakdown)


def test_steptimer_returns_positive_seconds():
    x = jnp.arange(1024.0)
    f = jax.jit(lambda v: jnp.sum(v * v))
    y = f(x)
    t = StepTimer()
    for _ in range(3):
        y = f(x + y * 0)
    dt = t.stop(y, steps=3)
    assert dt > 0
    assert StepTimer.sync(y) == float(jnp.sum(x * x))


def test_trace_writes_xplane(tmp_path):
    logdir = str(tmp_path / "tr")
    f = jax.jit(lambda v: jnp.tanh(v) @ jnp.tanh(v).T)
    x = jnp.ones((64, 64))
    f(x)
    with trace(logdir):
        StepTimer.sync(f(x))
    hits = glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*"))
    assert hits, "trace produced no profile files"
    rows = hlo_breakdown(logdir, top=5)
    assert isinstance(rows, list)           # [] if xprof missing
    cats = category_breakdown(logdir)
    assert isinstance(cats, dict)


def test_runtime_layer_summary():
    """Live traced per-layer shape dump (the forward-hook summary analogue,
    utils_20231218.py:692-811) — abstract eval, so full-size-free."""
    import jax
    import numpy as np
    from onet_tpu.models.onet import onet_init
    from onet_tpu.utils.summary import runtime_layer_summary

    params, state = onet_init(jax.random.key(0), 1, base=8)
    x = np.zeros((2, 32, 32, 1), np.float32)
    rows = runtime_layer_summary(params, state, jax.numpy.asarray(x))
    ops = [r["op"] for r in rows]
    # 18 convs + 18 BNs + 4 pools + 4 transposed convs in execution order
    assert ops.count("conv3x3") == 18
    assert ops.count("batch_norm") == 18
    assert ops.count("max_pool_2x2") == 4
    assert ops.count("conv_transpose_2x2") == 4
    assert rows[0]["op"] == "conv3x3"
    # stacked twin pass: first conv emits [B, H, W, 2*base]
    assert rows[0]["out_shape"] == (2, 32, 32, 16)
    # odd sizes flow through the same tap path
    rows2 = runtime_layer_summary(params, state,
                                  jax.numpy.asarray(np.zeros((1, 50, 50, 1),
                                                             np.float32)))
    assert len(rows2) == len(rows)
