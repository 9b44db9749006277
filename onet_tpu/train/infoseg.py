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
import os
from functools import partial

import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import save_checkpoint, datehour_mark
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.arrays import ArrayDataset, batch_iterator
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.metrics.segmentation import (
    align_labels_hungarian, evaluate_binary_segmentation)
from onet_tpu.models.infoseg import (
    infoseg_init, infoseg_forward, compute_infoseg_loss, get_label)
from onet_tpu.report.logs import epoch_log_line, setup_logging
from onet_tpu.train.optim import adam_init, adam_update, step_decay


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


def evaluate(eval_step, params, state, test_ds: ArrayDataset,
             batch_sz: int):
    sums, n = None, 0
    for batch in batch_iterator(test_ds, batch_sz):
        m = {k: float(v) for k, v in eval_step(
            params, state, batch["imgs"], batch["labels"]).items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
        n += 1
    return {k: v / n for k, v in sums.items()}


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
    opt_state = adam_init(params)
    train_step = make_infoseg_train_step(policy)
    eval_step = make_infoseg_eval_step(policy)
    if log:
        setup_logging(config.out_root, config.model_name)

    history = {"loss": [], "eval": {}}
    for epoch in range(config.epoch_nums):
        lr = step_decay(config.base_lr, epoch, every=config.lr_decay_every,
                        factor=config.lr_decay)
        losses = []
        ek = jax.random.fold_in(k_loop, epoch)
        for batch in batch_iterator(train_ds, config.batch_sz, key=ek,
                                    drop_last=True):
            params, state, opt_state, loss = train_step(
                params, state, opt_state, batch["imgs"], lr)
            losses.append(loss)
        loss_epoch = float(jnp.mean(jnp.stack(losses)))
        history["loss"].append(loss_epoch)
        if epoch % config.eval_every == 0 or epoch == config.epoch_nums - 1:
            metrics = evaluate(eval_step, params, state, test_ds,
                               config.batch_sz)
            history["eval"][epoch] = metrics
            if log:
                import logging
                line = epoch_log_line(config.model_name, epoch, loss_epoch,
                                      lr, metrics)
                print(line)
                logging.info(line)

    path = os.path.join(
        config.out_root,
        f"{config.model_name}_{datehour_mark()}_epoch_"
        f"{config.epoch_nums - 1}.npz")
    save_checkpoint(path, params, state, config.epoch_nums - 1, opt_state)
    if log:
        print(f"[infoseg] checkpoint: {path}")
    return params, state, history
