"""Workload 1: unsupervised Onet training on simulated sea clutter.

TPU re-design of Train_Onet_on_simclutter_20250407.py:
* data is generated on device (sim.rayleigh) instead of loaded from .pt,
* the per-batch python loop drives ONE compiled train step with donated
  buffers; batches are device-side gathers,
* eval every ``eval_every`` epochs with the flip-test alignment and the
  (acc, miou, dr, far, tiou) bundle, batch-averaged like test_simclutter
  (:98-172),
* Adam lr 5e-6 halved every 100 epochs (:181,248-249), checkpoints at the
  final epoch and epoch 300 (:255-266), reference-format epoch log lines.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import (
    AsyncCheckpointWriter, datehour_mark, latest_checkpoint,
    load_checkpoint)
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.arrays import ArrayDataset, batch_iterator
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.models.onet import onet_init
from onet_tpu.train.preempt import PreemptGuard
from onet_tpu.models.unet import param_count
from onet_tpu.report.logs import epoch_log_line, setup_logging
from onet_tpu.train.optim import adam_init, step_decay
from onet_tpu.train.steps import make_train_step, make_eval_step


@dataclasses.dataclass
class SimclutterConfig:
    model_name: str = "onet_rayleigh"
    epoch_nums: int = 301
    batch_sz: int = 10
    input_sz: int = 224
    in_channels: int = 1
    weight_share: bool = True
    binit: bool = True
    low_snr: int = 0
    high_snr: int = 2
    # clutter family: "rayleigh" or "k" (the reference's bg_type,
    # Rayleigh_bg_Gaussian_EOT_generator_20230208.py:251-275)
    bg: str = "rayleigh"
    frames_per_level: int = 150
    base_lr: float = 1e-5 / 2
    lr_decay_every: int = 100
    lr_decay: float = 0.5
    eval_every: int = 50
    out_root: str = "./checkpoint/sim_clutter"
    seed: int = 1981
    base_channels: int = 64
    save_epochs: tuple = (300,)
    # complement-input bias: X_d = clip(1 - X + bias, 0, 1). The reference
    # Onet carries this as a (default-0) attribute for low-SNR tuning
    # (Onet_vanilla_20240606.py:172,180).
    bias: float = 0.0
    # pixel augmentation (simbg4onetDataset compose) on train batches; the
    # published reference config runs with use_augmentation=False
    aug: bool = False
    # fault tolerance (additive over the reference): resume from the newest
    # checkpoint under out_root; periodic autosaves every N epochs with
    # keep-last-k rotation (0 disables)
    resume: bool = False
    autosave_every: int = 0
    autosave_keep: int = 3
    # preemption safety (additive): on SIGTERM — what a TPU-VM preemption
    # or a batch scheduler sends — finish the current step, write a
    # checkpoint into the autosave namespace, and return cleanly so
    # `resume=True` continues the run on the next VM. Installed only in
    # the main thread (signal handlers cannot be set elsewhere).
    preempt_save: bool = True
    # opt-in int8 training arithmetic (models/qtrain.py; SOL.md section 4):
    # None = exact, "fwd" = int8 forward convs, "fwd+dx" = also the
    # input-gradient convs. Gate on mask agreement (runs/qtrain_validate.py)
    quantized: str = None
    # backbone family (models/arch.py): "vanilla" conv U-Net or the "swin"
    # transformer ablation rebuilt from the published Swin-Unet
    arch: str = "vanilla"
    swin_window: int = 7
    swin_embed: int = 96
    convnext_embed: int = 96
    transunet_embed: int = 768
    transunet_depth: int = 12
    # training objective (models/onet.py::LOSSES): "jsd" — the reference
    # complement-negative objective — or "rsn", the random-sampling-negative
    # ablation (the absent onet_ablation_RSN module,
    # Train_Onet_on_simclutter_20250407.py:37,551-607)
    loss: str = "jsd"


def evaluate(eval_step, params, bn_state, test_ds: ArrayDataset, batch_sz: int):
    """Batch-averaged metric bundle (reference test_simclutter averaging)."""
    sums, n = None, 0
    for batch in batch_iterator(test_ds, batch_sz):
        metrics, loss, _ = eval_step(params, bn_state, batch["imgs"],
                                     batch["labels"])
        metrics = {k: float(v) for k, v in metrics.items()}
        sums = metrics if sums is None else {k: sums[k] + metrics[k]
                                             for k in sums}
        n += 1
    return {k: v / n for k, v in sums.items()}


def train(config: SimclutterConfig = SimclutterConfig(), *,
          policy: Policy = DEFAULT, mesh=None,
          pipeline_microbatches: int = None, spatial: bool = False,
          datasets=None, log: bool = True, progress_cb=None):
    """Run the workload. Returns (params, bn_state, history).

    ``pipeline_microbatches``: train via the exact GPipe pipeline
    (parallel/pipeline.py) on ``mesh`` (a ``('data', 'stage')`` mesh);
    eval stays replicated single-graph (the pipeline is a training
    structure — inference has no gradient/BN-update to stage).

    ``spatial``: train via the exact halo-exchange spatially-partitioned
    step (parallel/halo.py) on ``mesh`` — a ``('data', 'space')`` or 2-D
    ``('data', 'space', 'spacew')`` mesh; image rows (and columns) shard
    across chips. Eval stays data-sharded (inference needs no halo
    backward)."""
    key = jax.random.key(config.seed)
    k_data, k_model, k_loop = jax.random.split(key, 3)

    if datasets is None:
        train_ds, test_ds = simclutter_datasets(
            k_data, low_snr=config.low_snr, high_snr=config.high_snr,
            frames_per_level=config.frames_per_level, crop=config.input_sz,
            bg=config.bg)
    else:
        train_ds, test_ds = datasets

    from onet_tpu.models.arch import get_arch
    arch = get_arch(config.arch, swin_window=config.swin_window,
                    swin_embed=config.swin_embed,
                    convnext_embed=config.convnext_embed,
                    transunet_embed=config.transunet_embed,
                    transunet_depth=config.transunet_depth)
    params, bn_state = arch.init(k_model, config.in_channels,
                                 weight_share=config.weight_share,
                                 base=config.base_channels)
    fwd = None if arch.vanilla else arch.forward
    opt_state = adam_init(params)
    if pipeline_microbatches:
        if mesh is None:
            raise ValueError("pipeline_microbatches requires a "
                             "('data', 'stage') mesh")
        if config.quantized:
            raise ValueError("pipeline training is exact-arithmetic only")
        if not arch.vanilla:
            raise ValueError("pipeline stages are defined on the vanilla "
                             "conv U-Net only")
        if config.loss != "jsd":
            raise ValueError("pipeline training uses the jsd objective "
                             "(the per-microbatch schedule fixes the loss)")
        from onet_tpu.parallel.pipeline import make_pp_train_step
        train_step = make_pp_train_step(
            mesh, microbatches=pipeline_microbatches, policy=policy,
            bias=config.bias)
        eval_step = make_eval_step(policy=policy, align="flip",
                                   bias=config.bias)
    elif spatial:
        if mesh is None:
            raise ValueError("spatial=True requires a ('data','space'"
                             "[,'spacew']) mesh")
        if config.quantized:
            raise ValueError("spatial training is exact-arithmetic only")
        if not arch.vanilla or config.loss != "jsd":
            raise ValueError("spatial training is defined on the vanilla "
                             "conv U-Net with the jsd objective")
        from onet_tpu.parallel.halo import make_spatial_train_step
        # (the step itself validates the actual batch H/W against the
        # mesh's pool-divisibility constraint)
        train_step = make_spatial_train_step(mesh, policy=policy,
                                             bias=config.bias)
        # eval shards the batch over 'data' only (forward needs no halos)
        eval_step = make_eval_step(policy=policy, align="flip", mesh=mesh,
                                   bias=config.bias)
    else:
        train_step = make_train_step(policy=policy, mesh=mesh,
                                     bias=config.bias,
                                     quantized=config.quantized,
                                     forward=fwd, loss=config.loss)
        eval_step = make_eval_step(policy=policy, align="flip", mesh=mesh,
                                   bias=config.bias, forward=fwd,
                                   loss=config.loss)
    if mesh is not None and not pipeline_microbatches:
        # remainder eval batches can't shard over the data axis; fall back
        # to a replicated single-compile eval for those (eval shards over
        # 'data' only, so that axis — not the whole mesh — is the divisor)
        from onet_tpu.core.mesh import DATA_AXIS as _DA
        ndev = int(mesh.shape.get(_DA, mesh.devices.size))
        eval_mesh = eval_step
        eval_plain = make_eval_step(policy=policy, align="flip",
                                    bias=config.bias, forward=fwd,
                                    loss=config.loss)

        def eval_step(p, b, x, labels):  # noqa: F811
            if x.shape[0] % ndev == 0:
                return eval_mesh(p, b, x, labels)
            return eval_plain(p, b, x, labels)

    if log:
        log_file = setup_logging(config.out_root, config.model_name)
        logging.info("train simclutter: %d frames, %.1fM params",
                     len(train_ds), param_count(params) / 1e6)

    history = {"loss": [], "eval": {}}
    mark = datehour_mark()
    writer = AsyncCheckpointWriter()
    # preemption guard: SIGTERM sets a flag; the loop drains the current
    # step, checkpoints, and returns (train/preempt.py). try/finally so an
    # exception escaping the loop still restores the previous handler —
    # long-lived in-process callers (sweeps, test suites) otherwise keep a
    # dead guard's flag-setter installed (advisor round-3 finding).
    guard = PreemptGuard(config.preempt_save).install()
    try:
        start_epoch = 0
        if config.resume:
            ck = latest_checkpoint(config.out_root)
            if ck:
                params, bn_state, last, opt_loaded = load_checkpoint(
                    ck, params, bn_state, opt_template=opt_state)
                start_epoch = last + 1
                if opt_loaded is not None:
                    opt_state = opt_loaded
                elif log:
                    logging.warning(
                        "Checkpoint %s has no optimizer state; Adam moments "
                        "and step count restart from zero", ck)
                if log:
                    logging.info("Resumed from %s (epoch %d)", ck, last)
        for epoch in range(start_epoch, config.epoch_nums):
            lr = step_decay(config.base_lr, epoch, every=config.lr_decay_every,
                            factor=config.lr_decay)
            losses = []
            ek = jax.random.fold_in(k_loop, epoch)
            for bi, batch in enumerate(batch_iterator(train_ds, config.batch_sz,
                                                      key=ek)):
                x = batch["imgs"]
                if pipeline_microbatches:
                    # GPipe needs full microbatches: drop the ragged tail
                    # (shuffled each epoch, so no frame is systematically lost)
                    div = pipeline_microbatches * int(mesh.shape["data"])
                    if x.shape[0] % div:
                        continue
                if config.aug:
                    from onet_tpu.data.augment import simclutter_pixel_augment
                    x = simclutter_pixel_augment(jax.random.fold_in(ek, bi), x)
                params, bn_state, opt_state, loss = train_step(
                    params, bn_state, opt_state, x, lr)
                losses.append(loss)
                if guard.triggered:
                    break
            if guard.triggered:
                # drain: checkpoint into the autosave namespace (auto-resume
                # finds it; rotation keeps it inside autosave_keep). The
                # interrupted epoch is recorded as NOT done (epoch - 1), so
                # resume redoes it in full — exactness over wall time.
                path = os.path.join(
                    config.out_root,
                    f"{config.model_name}_autosave_{max(epoch - 1, 0)}"
                    f"_{mark}.npz")
                from onet_tpu.models.arch import arch_meta
                writer.save(path, params, bn_state, epoch - 1,
                            opt_state=opt_state, meta=arch_meta(config))
                history["preempted"] = epoch
                msg = (f"SIGTERM: preempted at epoch {epoch}; checkpoint "
                       f"saved -> {path} (resume=True continues)")
                if log:
                    print(msg)
                    logging.warning(msg)
                break
            if not losses:
                raise ValueError(
                    f"every batch was dropped: no batch of {config.batch_sz} "
                    "divides into the pipeline's microbatches x data shards")
            loss_epoch = float(jnp.mean(jnp.stack(losses)))
            history["loss"].append(loss_epoch)

            if epoch % config.eval_every == 0 or epoch == config.epoch_nums - 1:
                metrics = evaluate(eval_step, params, bn_state, test_ds,
                                   config.batch_sz)
                history["eval"][epoch] = metrics
                line = epoch_log_line(config.model_name, epoch, loss_epoch, lr,
                                      metrics)
                if log:
                    print(line)
                    logging.info(line)
                if progress_cb:
                    progress_cb(epoch, loss_epoch, metrics)

            autosave = (config.autosave_every
                        and epoch % config.autosave_every == 0)
            milestone = (epoch == config.epoch_nums - 1
                         or epoch in config.save_epochs)
            if milestone or autosave:
                # autosaves live in their own filename namespace so rotation can
                # never delete milestone/final checkpoints (or another model's)
                tag = "epoch" if milestone else "autosave"
                path = os.path.join(
                    config.out_root,
                    f"{config.model_name}_{tag}_{epoch}_{mark}.npz")
                from onet_tpu.models.arch import arch_meta
                # async: the host snapshot is synchronous (donated buffers),
                # the npz write + autosave rotation overlap the next epochs;
                # writer.wait() below surfaces any IO error before return
                writer.save(path, params, bn_state, epoch,
                            opt_state=opt_state, meta=arch_meta(config),
                            rotate=None if milestone else (
                                config.out_root, config.autosave_keep,
                                f"{config.model_name}_autosave_*.npz"))
                if log:
                    logging.info("Saved checkpoint at epoch %d: %s", epoch, path)

        writer.wait()
    finally:
        guard.restore()
    if log:
        from onet_tpu.report.curves import save_training_curves

        save_training_curves(
            os.path.join(config.out_root,
                         f"{config.model_name}_train_loss_{mark}.png"),
            history["loss"], history["eval"])
    return params, bn_state, history
