"""Shared training harness for the rebuilt comparison baselines.

InfoSeg (train/infoseg.py) and IIC (train/iic.py) share everything but
the model and train-step: device-generated clutter datasets, a donated
compiled step over shuffled drop-last batches, Hungarian-aligned eval
every N epochs, reference-format epoch log lines (printed AND persisted
to the run log), and one final checkpoint. This module is that shared
loop, so a fix lands once instead of once per baseline.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import save_checkpoint, datehour_mark
from onet_tpu.data.arrays import ArrayDataset, batch_iterator
from onet_tpu.report.logs import epoch_log_line, setup_logging
from onet_tpu.train.optim import step_decay


def evaluate(eval_step, params, state, test_ds: ArrayDataset,
             batch_sz: int):
    """Batch-averaged metric bundle over the test set."""
    sums, n = None, 0
    for batch in batch_iterator(test_ds, batch_sz):
        m = {k: float(v) for k, v in eval_step(
            params, state, batch["imgs"], batch["labels"]).items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
        n += 1
    return {k: v / n for k, v in sums.items()}


def baseline_training_loop(config, params, state, opt_state, train_step,
                           eval_step, train_ds, test_ds, loop_key, *,
                           step_takes_key: bool = False, log: bool = True,
                           tag: str = "baseline"):
    """The common epoch loop. ``config`` needs model_name / epoch_nums /
    batch_sz / base_lr / lr_decay_every / lr_decay / eval_every /
    out_root. ``loop_key`` is the caller's shuffle/view PRNG key (kept as
    a parameter so the drivers' historical key-split layout — and thus
    their committed run logs — keep reproducing). ``train_step(params,
    state, opt, x[, key], lr)`` per ``step_takes_key``. Returns
    (params, state, history)."""
    k_loop = loop_key
    if log:
        setup_logging(config.out_root, config.model_name)

    history = {"loss": [], "eval": {}}
    from onet_tpu.train.preempt import PreemptGuard
    guard = PreemptGuard().install()
    try:
        for epoch in range(config.epoch_nums):
            lr = step_decay(config.base_lr, epoch, every=config.lr_decay_every,
                            factor=config.lr_decay)
            losses = []
            ek = jax.random.fold_in(k_loop, epoch)
            for bi, batch in enumerate(batch_iterator(
                    train_ds, config.batch_sz, key=ek, drop_last=True)):
                args = ((jax.random.fold_in(ek, bi),)
                        if step_takes_key else ())
                params, state, opt_state, loss = train_step(
                    params, state, opt_state, batch["imgs"], *args, lr)
                losses.append(loss)
                if guard.triggered:
                    break
            if guard.triggered:
                # drain like the main drivers (train/preempt.py): checkpoint
                # with the interrupted epoch NOT recorded, return cleanly
                path = os.path.join(
                    config.out_root,
                    f"{config.model_name}_preempt{max(epoch - 1, 0)}"
                    f"_{datehour_mark()}.npz")
                save_checkpoint(path, params, state, epoch - 1, opt_state)
                history["preempted"] = epoch
                if log:
                    msg = (f"SIGTERM: preempted at epoch {epoch}; "
                           f"checkpoint saved -> {path}")
                    print(msg)
                    logging.warning(msg)
                return params, state, history
            loss_epoch = float(jnp.mean(jnp.stack(losses)))
            history["loss"].append(loss_epoch)
            if epoch % config.eval_every == 0 or epoch == config.epoch_nums - 1:
                metrics = evaluate(eval_step, params, state, test_ds,
                                   config.batch_sz)
                history["eval"][epoch] = metrics
                if log:
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
            print(f"[{tag}] checkpoint: {path}")
        return params, state, history
    finally:
        guard.restore()
