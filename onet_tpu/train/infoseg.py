"""InfoSeg baseline training on simulated clutter ("InfoSeg_Simbg").

The reference trains its (snapshot-absent) InfoSeg on the simulated
background set and evaluates it on NAU rain frames next to Onet and CFAR
(``exp_nau_rain_20240513.py:312-533``; checkpoint schema ``{"net": ...}``
with config keys ``input_chn``/``gt_k``, :319-323). This driver mirrors
that recipe with the TPU-native model in ``models/infoseg.py``: clutter
frames generated on device, one donated compiled train step, Hungarian
label alignment for the unsupervised metric bundle.
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
from onet_tpu.models.infoseg import (
    infoseg_init, infoseg_forward, compute_infoseg_loss, get_label)
from onet_tpu.train.baseline import baseline_training_loop
from onet_tpu.train.optim import adam_init, adam_update


@dataclasses.dataclass
class InfoSegConfig:
    model_name: str = "infoseg_simbg"
    epoch_nums: int = 60
    batch_sz: int = 10
    input_sz: int = 224
    in_channels: int = 1
    k_classes: int = 2
    low_snr: int = 0
    high_snr: int = 2
    frames_per_level: int = 150
    base_lr: float = 1e-4
    lr_decay_every: int = 30
    lr_decay: float = 0.5
    eval_every: int = 10
    out_root: str = "./checkpoint/infoseg"
    seed: int = 1981
    base_channels: int = 64


def make_infoseg_train_step(policy: Policy = DEFAULT):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt_state, x, lr):
        def loss_fn(p):
            out, ns = infoseg_forward(p, state, x, train=True,
                                      policy=policy)
            return compute_infoseg_loss(out), ns
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt2 = adam_update(grads, opt_state, lr)
        new_params = jax.tree.map(jnp.add, params, updates)
        return new_params, new_state, opt2, loss
    return step


def make_infoseg_eval_step(policy: Policy = DEFAULT):
    @jax.jit
    def step(params, state, x, labels):
        out, _ = infoseg_forward(params, state, x, train=False,
                                 policy=policy)
        pred = align_labels_hungarian(get_label(out.probs),
                                      labels.astype(jnp.int32))
        return evaluate_binary_segmentation(pred, labels.astype(jnp.int32))
    return step


def train(config: InfoSegConfig = InfoSegConfig(), *,
          policy: Policy = DEFAULT, datasets=None, log: bool = True):
    """Train the InfoSeg baseline. Returns (params, state, history)."""
    key = jax.random.key(config.seed)
    k_data, k_model, k_loop = jax.random.split(key, 3)
    if datasets is None:
        train_ds, test_ds = simclutter_datasets(
            k_data, low_snr=config.low_snr, high_snr=config.high_snr,
            frames_per_level=config.frames_per_level, crop=config.input_sz)
    else:
        train_ds, test_ds = datasets

    params, state = infoseg_init(k_model, config.in_channels,
                                 config.k_classes,
                                 base=config.base_channels)
    return baseline_training_loop(
        config, params, state, adam_init(params),
        make_infoseg_train_step(policy), make_infoseg_eval_step(policy),
        train_ds, test_ds, k_loop, log=log, tag="infoseg")
