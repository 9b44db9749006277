"""Worker process for tests/test_multihost.py (not a pytest module).

Each invocation is one coordinated process:

    python multihost_worker.py <coordinator> <num_processes> <process_id>

Joins the coordination service on the CPU backend (2 virtual local devices
per process), builds the GLOBAL mesh, runs ONE full train step on a
deterministic global batch, and prints loss + a parameter-update checksum
for the parent to compare against the single-process oracle.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from onet_tpu.parallel import multihost

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    from onet_tpu.core.mesh import make_mesh
    from onet_tpu.core.policy import DEFAULT
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    params, bn = onet_init(jax.random.key(7), 1, base=8)
    opt = adam_init(params)
    mesh = make_mesh()                      # all 2*nproc global devices
    step = make_train_step(policy=DEFAULT, mesh=mesh)

    full = np.random.default_rng(3).uniform(
        0, 1, (8, 32, 32, 1)).astype(np.float32)
    local = full[multihost.process_batch_slice(8)]
    xg = multihost.global_batch(mesh, local)
    assert xg.shape == (8, 32, 32, 1)

    params, bn, opt, loss = step(params, bn, opt, xg, 1e-3)
    # parameter-update checksum: pulls the (replicated) updated params —
    # identical across processes iff the gradient all-reduce is correct
    checksum = sum(float(abs(np.asarray(v)).sum())
                   for v in jax.tree.leaves(params))
    print(f"RESULT pid={pid} loss={float(loss):.10f} "
          f"checksum={checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
