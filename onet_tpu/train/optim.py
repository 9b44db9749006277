"""Optimizer and LR schedules.

Adam matches torch.optim.Adam(betas=(0.9, 0.999), eps=1e-8, wd=0) — the
reference's optimizer everywhere (Train_Onet_on_simclutter_20250407.py:181,
Train_Onet_on_zy3_20240606.py:89). Built on optax.scale_by_adam with the
learning rate injected per step, because the reference mutates
``opt.param_groups[0]['lr']`` imperatively mid-training (x0.5 every 100
epochs, :248-249) and the zy3 driver uses torch's CosineAnnealingWarmRestarts
(:90); passing lr as a traced scalar keeps one compiled step for the whole
schedule.
"""

from __future__ import annotations

import math

import jax
import optax

_ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)


def adam_init(params):
    return _ADAM.init(params)


def adam_update(grads, opt_state, lr):
    """One Adam transform step; ``lr`` is a traced scalar."""
    updates, opt_state = _ADAM.update(grads, opt_state)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    return updates, opt_state


def step_decay(base_lr: float, epoch: int, *, every: int = 100,
               factor: float = 0.5) -> float:
    """lr *= factor at each multiple of ``every`` (epoch > 0), evaluated
    host-side per epoch — reference simclutter schedule (:248-249)."""
    return base_lr * factor ** (epoch // every)


def cosine_warm_restarts(base_lr: float, epoch: int, *, t0: int = 300,
                         t_mult: int = 2, eta_min: float = 1e-6) -> float:
    """torch CosineAnnealingWarmRestarts semantics, stepped per epoch
    (reference zy3 schedule, Train_Onet_on_zy3_20240606.py:90,128)."""
    t_cur, t_i = epoch, t0
    while t_cur >= t_i:
        t_cur -= t_i
        t_i *= t_mult
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t_cur / t_i)) / 2


def freeze_params(grads, frozen_fn):
    """Zero the gradient of frozen leaves (the JAX analogue of the
    reference's requires_grad toggles, Train_Onet_on_zy3_20240606.py:67-72).

    ``frozen_fn(path_tuple) -> bool`` marks leaves to freeze; paths are
    tuples of dict keys from the root.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    treedef = jax.tree_util.tree_structure(grads)
    leaves = []
    for path, leaf in flat:
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path)
        leaves.append(jax.numpy.zeros_like(leaf) if frozen_fn(keys) else leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
