"""Mixed-precision policy for the compute path.

TPU MXU peak throughput is in bfloat16; BatchNorm statistics and the JSD
loss must stay in float32 for numerical parity with the float32 reference
(reference pins float32 globally: Onet_vanilla_20240606.py:34).

The policy threads through every apply function: parameters are stored in
``param_dtype``, convolution inputs/weights are cast to ``compute_dtype``
with accumulation forced to float32 via ``preferred_element_type``, and
normalization/loss math runs in ``norm_dtype``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    # MXU precision for fp32 operands. TPUs silently truncate fp32 matmul /
    # conv inputs to bf16 at DEFAULT precision; the fp32 policy pins HIGHEST
    # so float32 means float32 (parity with the fp32 torch reference). The
    # bf16 policy keeps DEFAULT — operands are already bf16.
    precision: lax.Precision = lax.Precision.HIGHEST

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_norm(self, x):
        return x.astype(self.norm_dtype)


DEFAULT = Policy()
# bf16 on the MXU, fp32 accumulation: the production policy.
BF16_COMPUTE = Policy(compute_dtype=jnp.bfloat16, precision=lax.Precision.DEFAULT)
