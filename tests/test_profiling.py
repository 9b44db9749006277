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
