"""IIC baseline training on simulated clutter.

The reference's united config file names IIC as one of its four model
families (configs/config_tip2022_20230411.py:2) and keeps a dedicated
config path for it (:46-100, mirrored by ``core/config.py::
setup_config_iic``); the model module is absent from the snapshot, so —
as with InfoSeg (train/infoseg.py) — the published method is rebuilt
TPU-native (models/iic.py) and trained on the same simulated-clutter
recipe the other baselines use, evaluated with the Hungarian-aligned
unsupervised metric bundle.

Each step draws one random view pair; BOTH views ride one batch-stacked
``[2N, H, W, C]`` forward (shared BN statistics, one compiled graph) and
the IIC mutual-information objective couples them through the
displacement-window joint.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.metrics.segmentation import (
    align_labels_hungarian, evaluate_binary_segmentation)
from onet_tpu.models.iic import (
    IICOut, compute_iic_loss, get_label, iic_forward, iic_init,
    iic_pair_transform, iic_undo_geometry)
from onet_tpu.train.baseline import baseline_training_loop
from onet_tpu.train.optim import adam_init, adam_update


@dataclasses.dataclass
class IICConfig:
    model_name: str = "iic_simbg"
    epoch_nums: int = 60
    batch_sz: int = 10
    input_sz: int = 224
    in_channels: int = 1
    k_classes: int = 2
    k_aux: int = 6
    low_snr: int = 0
    high_snr: int = 2
    frames_per_level: int = 150
    base_lr: float = 1e-4
    lr_decay_every: int = 30
    lr_decay: float = 0.5
    eval_every: int = 10
    out_root: str = "./checkpoint/iic"
    seed: int = 1981
    base_channels: int = 64
    max_shift: int = 2
    window_radius: int = 1
    mi_lambda: float = 1.0


def make_iic_train_step(config: IICConfig, policy: Policy = DEFAULT):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt_state, x, key, lr):
        x2, meta = iic_pair_transform(key, x,
                                      max_shift=config.max_shift)

        def loss_fn(p):
            out, ns = iic_forward(p, state, jnp.concatenate([x, x2]),
                                  train=True, policy=policy)
            n = x.shape[0]
            out1 = IICOut(out.probs[:n], out.probs_aux[:n])
            p2, mask = iic_undo_geometry(out.probs[n:], meta)
            p2a, _ = iic_undo_geometry(out.probs_aux[n:], meta)
            out2 = IICOut(p2, p2a)
            return compute_iic_loss(out1, out2, mask,
                                    radius=config.window_radius,
                                    lam=config.mi_lambda), ns

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = adam_update(grads, opt_state, lr)
        new_params = jax.tree.map(jnp.add, params, updates)
        return new_params, new_state, opt2, loss
    return step


def make_iic_eval_step(policy: Policy = DEFAULT):
    @jax.jit
    def step(params, state, x, labels):
        out, _ = iic_forward(params, state, x, train=False, policy=policy)
        pred = align_labels_hungarian(get_label(out.probs),
                                      labels.astype(jnp.int32))
        return evaluate_binary_segmentation(pred, labels.astype(jnp.int32))
    return step


def train(config: IICConfig = IICConfig(), *,
          policy: Policy = DEFAULT, datasets=None, log: bool = True):
    """Train the IIC baseline. Returns (params, state, history)."""
    key = jax.random.key(config.seed)
    k_data, k_model, k_loop = jax.random.split(key, 3)
    if datasets is None:
        train_ds, test_ds = simclutter_datasets(
            k_data, low_snr=config.low_snr, high_snr=config.high_snr,
            frames_per_level=config.frames_per_level, crop=config.input_sz)
    else:
        train_ds, test_ds = datasets

    params, state = iic_init(k_model, config.in_channels,
                             config.k_classes, k_aux=config.k_aux,
                             base=config.base_channels)
    return baseline_training_loop(
        config, params, state, adam_init(params),
        make_iic_train_step(config, policy), make_iic_eval_step(policy),
        train_ds, test_ds, k_loop, step_takes_key=True, log=log,
        tag="iic")
