"""Profiling and step-timing utilities.

The reference's only observability was ``time.perf_counter`` prints and a
forward-hook FLOP summary (utils_20231218.py:692-811, covered statically by
utils/summary.py). The TPU build adds what a real framework needs:

* ``StepTimer`` — wall-clock step timing that is correct on the axon TPU
  backend, where ``jax.block_until_ready`` does NOT synchronize: every
  measured region must end with a real device->host fetch of a value that
  data-depends on the timed computation. ``StepTimer.sync`` does that.
* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard
  xplane trace.
* ``hlo_breakdown`` — parses a captured xplane into a per-HLO-category time
  table (the tool used to attribute the round-2 perf work); needs the
  ``xprof`` package (present in this image), returns [] if unavailable.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax


class StepTimer:
    """Times jitted steps with a true device sync.

    >>> t = StepTimer()
    >>> for _ in range(n):
    ...     state, loss = step(state, batch)
    >>> dt = t.stop(loss, steps=n)   # seconds/step; fetches loss to sync

    The constructor performs no sync: call it right after a warmup fetch.
    """

    def __init__(self):
        self.t0 = time.perf_counter()

    @staticmethod
    def sync(value) -> float:
        """Force a device->host fetch (axon-safe sync). Returns the scalar."""
        leaf = jax.tree.leaves(value)[0]
        return float(jax.numpy.ravel(leaf)[0])

    def stop(self, value: Any, steps: int = 1) -> float:
        """Sync on ``value`` and return seconds per step."""
        self.sync(value)
        return (time.perf_counter() - self.t0) / max(steps, 1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _find_xplane(logdir: str) -> Optional[str]:
    hits = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    return hits[-1] if hits else None


def hlo_breakdown(logdir_or_xplane: str, top: int = 20) -> List[Dict[str, Any]]:
    """Summarize a captured trace: total device ms per HLO op, descending.

    Returns a list of dicts with keys ``name``, ``category``, ``total_ms``,
    ``occurrences``, ``gflops_per_s``, ``bw_gib_per_s``, ``bound_by``.
    Empty list when the xprof converter is unavailable.
    """
    xplane = logdir_or_xplane
    if os.path.isdir(xplane):
        xplane = _find_xplane(xplane)
    if not xplane or not os.path.exists(xplane):
        return []
    try:
        from xprof.convert import raw_to_tool_data as rtd
        data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    except Exception:
        return []
    d = json.loads(data)
    cols = [c["label"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}

    def val(r, c):
        return r["c"][idx[c]]["v"]

    rows = sorted(d["rows"], key=lambda r: -float(val(r, "Total time (us)")))
    out = []
    for r in rows[:top]:
        out.append({
            "name": val(r, "HLO op name"),
            "category": val(r, "HLO op category"),
            "total_ms": float(val(r, "Total time (us)")) / 1e3,
            "occurrences": int(val(r, "#Occurrences")),
            "gflops_per_s": float(val(r, "Model GFLOP/s") or 0),
            "bw_gib_per_s": float(val(r, "Measured memory BW (GiB/s)") or 0),
            "bound_by": val(r, "Bound by"),
        })
    return out


def category_breakdown(logdir_or_xplane: str) -> Dict[str, float]:
    """Total device ms per HLO op category over the whole trace."""
    rows = hlo_breakdown(logdir_or_xplane, top=10 ** 6)
    agg: Dict[str, float] = {}
    for r in rows:
        agg[r["category"]] = agg.get(r["category"], 0.0) + r["total_ms"]
    return dict(sorted(agg.items(), key=lambda kv: -kv[1]))
