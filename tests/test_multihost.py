"""Multi-host SPMD bootstrap (parallel/multihost.py).

Two REAL coordinated processes (jax.distributed over localhost, CPU
backend, 2 virtual devices each = 4 global) run one data-parallel train
step on a global batch; the updated parameters and loss must match the
single-process run of the SAME batch exactly — proving the cross-process
gradient all-reduce computes the same mathematics as one device. This is
the DCN-path analogue of tests/test_weak_scaling.py's single-process mesh
evidence.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
RESULT_RE = re.compile(
    r"RESULT pid=(\d) loss=([0-9.+-eE]+) checksum=([0-9.+-eE]+)")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # scrub harness settings that would fight the worker's own env setup
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, WORKER, coordinator, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        m = RESULT_RE.search(out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # both processes observed the identical replicated state
    assert results[0] == results[1], results

    # single-process oracle: same global batch, same init, no mesh
    from onet_tpu.core.policy import DEFAULT
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    params, bn = onet_init(jax.random.key(7), 1, base=8)
    opt = adam_init(params)
    step = make_train_step(policy=DEFAULT)
    full = np.random.default_rng(3).uniform(
        0, 1, (8, 32, 32, 1)).astype(np.float32)
    params, bn, opt, loss = step(params, bn, opt, full, 1e-3)
    checksum = sum(float(abs(np.asarray(v)).sum())
                   for v in jax.tree.leaves(params))

    got_loss, got_sum = results[0]
    np.testing.assert_allclose(got_loss, float(loss), rtol=1e-6)
    np.testing.assert_allclose(got_sum, checksum, rtol=1e-6)
