"""Workload 4: unsupervised ZY-3 cloud-detection training.

TPU re-design of Train_Onet_on_zy3_20240606.py:74-177:
* Adam lr 1e-4 + cosine-warm-restarts(T0=300, mult=2, eta_min=1e-6)
  stepped per epoch (:89-90,128),
* device-side augmentation on the unsupervised train batches (aug=True in
  the reference config),
* EVERY epoch: eval with per-image Hungarian (K=2) alignment and per-image
  (acc, miou, dr, far) averaging + test JSD loss, matching test_on_zy3_nail
  (uti_zy3_test_20240123.py:151-230) but without the per-epoch host/scipy
  sync,
* checkpoint at the final epoch (and 300), restart support (:77-82).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import save_checkpoint, load_checkpoint, datehour_mark
from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.arrays import ArrayDataset, batch_iterator
from onet_tpu.data.augment import augment_batch
from onet_tpu.models.onet import onet_init, onet_forward, compute_loss, predict_label
from onet_tpu.metrics.segmentation import (
    align_labels_hungarian, evaluate_binary_segmentation)
from onet_tpu.report.logs import setup_logging
from onet_tpu.train.optim import adam_init, cosine_warm_restarts
from onet_tpu.train.steps import make_train_step


@dataclasses.dataclass
class Zy3Config:
    model_name: str = "onet_vanilla_zy3"
    epoch_nums: int = 11
    batch_sz: int = 5
    input_sz: int = 224
    in_channels: int = 3
    weight_share: bool = True
    aug: bool = True
    base_lr: float = 1e-4
    eta_min: float = 1e-6
    t0: int = 300
    t_mult: int = 2
    out_root: str = "./checkpoint/zy3/onet_vanilla"
    seed: int = 1981
    base_channels: int = 64
    restart_from: Optional[str] = None
    # preemption safety (train/preempt.py): SIGTERM -> drain the step,
    # checkpoint, return cleanly; pass the saved path as restart_from to
    # continue (the interrupted epoch is redone in full)
    preempt_save: bool = True
    save_epochs: tuple = (300,)
    # backbone family (models/arch.py): "vanilla" conv U-Net, the "swin"
    # transformer ablation (the reference's train_outc_model instantiates
    # Onet_Swin_Unet on this same zy3 driver, Train_Onet_on_zy3_20240606.py
    # :313-382), or the "convnext" ablation (:22-28)
    arch: str = "vanilla"
    swin_window: int = 7
    swin_embed: int = 96
    convnext_embed: int = 96
    transunet_embed: int = 768
    transunet_depth: int = 12
    # training objective (models/onet.py::LOSSES): "jsd" or the "rsn"
    # random-sampling-negative ablation (the absent onet_ablation_RSN
    # module the reference's train_rsn_model consumes,
    # Train_Onet_on_zy3_20240606.py:225-269)
    loss: str = "jsd"


def make_zy3_eval(*, policy: Policy = DEFAULT, forward=None,
                  loss: str = "jsd"):
    """Per-image Hungarian-aligned metric bundle + batch test loss (the
    objective is getattr-swapped in the reference for ablations,
    Onet_vanilla_20240606.py:253-256 — ``loss`` plays that role here)."""
    fwd = forward or onet_forward
    from onet_tpu.models.onet import LOSSES
    loss_of = LOSSES[loss]

    @jax.jit
    def eval_batch(params, bn_state, x, labels):
        out, _ = fwd(params, bn_state, x, train=False, policy=policy)
        loss = loss_of(out)
        pred = predict_label(out.S)

        def per_image(p, l):
            p2 = align_labels_hungarian(p, l)
            return evaluate_binary_segmentation(p2, l), p2

        metrics, aligned = jax.vmap(per_image)(pred, labels)
        return metrics, loss, aligned, out.Vt, out.Vd

    return eval_batch


def evaluate_zy3(eval_batch, params, bn_state, test_ds: ArrayDataset,
                 batch_sz: int):
    """Returns (mean metrics dict incl. test loss, per-image metric arrays)."""
    per_img = {k: [] for k in ("acc", "miou", "dr", "far", "tiou")}
    losses = []
    for batch in batch_iterator(test_ds, batch_sz):
        metrics, loss, _, _, _ = eval_batch(params, bn_state, batch["imgs"],
                                            batch["labels"])
        for k in per_img:
            per_img[k].append(np.asarray(metrics[k]))
        losses.append(float(loss))
    per_img = {k: np.concatenate(v) for k, v in per_img.items()}
    mean = {k: float(v.mean()) for k, v in per_img.items()}
    mean["test_loss"] = float(np.mean(losses))
    return mean, per_img


GROUP_NAMES = ("normal_cloud", "thin_cloud", "snow_cloud")


def save_zy3_test_results(out_path: str, params, bn_state,
                          test_ds: ArrayDataset, ids,
                          groups: Optional[dict] = None, *,
                          batch_sz: int = 5, policy: Policy = DEFAULT,
                          draw: bool = False, draw_all: bool = False,
                          epoch: Optional[int] = None,
                          model_name: str = "onet_zy3", forward=None):
    """Excel report with embedded thumbnails + per-group summary.

    Parity with save_zy3_test_results_to_excel / save_results_to_excel
    (uti_zy3_test_20240123.py:320-429,541-591): one row per test image with
    img_id / acc / miou / group plus 50x50 rgb, label, pred (Hungarian-
    aligned), Vt, Vd thumbnails in columns I-M; a summary sheet carries the
    per-group and overall means the reference prints/logs. ``groups`` maps
    group name -> list of img_ids (get_divided_test_list, :304-318); images
    in no group get group -1 (the reference prints a warning).
    Returns (path, summary DataFrame).
    """
    import pandas as pd

    from onet_tpu.ops.normalize import minmax_per_frame
    from onet_tpu.report.tables import save_zy3_excel_report

    eval_batch = make_zy3_eval(policy=policy, forward=forward)
    group_of = {}
    for gi, gname in enumerate(GROUP_NAMES):
        for img_id in (groups or {}).get(gname, []):
            group_of[str(img_id)] = gi
    rows = []
    det_scores, det_labels = [], []
    idx = 0
    for batch in batch_iterator(test_ds, batch_sz):
        metrics, _, aligned, vt, vd = eval_batch(params, bn_state,
                                                 batch["imgs"],
                                                 batch["labels"])
        det_scores.append((np.asarray(vt), np.asarray(vd)))
        det_labels.append(np.asarray(batch["labels"]))
        vt = np.asarray(minmax_per_frame(vt))
        vd = np.asarray(minmax_per_frame(vd))
        n = batch["imgs"].shape[0]
        for i in range(n):
            img_id = str(ids[idx]) if idx < len(ids) else f"img_{idx:04d}"
            rows.append({
                "img_id": img_id,
                "acc": float(metrics["acc"][i]),
                "miou": float(metrics["miou"][i]),
                "group": group_of.get(img_id, -1),
                "rgb": np.asarray(batch["imgs"][i]),
                "label": np.asarray(batch["labels"][i]).astype(np.float32),
                "pred": np.asarray(aligned[i]).astype(np.float32),
                "vt": vt[i],
                "vd": vd[i],
            })
            idx += 1
    summary_rows = []
    for gi, gname in enumerate(GROUP_NAMES):
        sub = [r for r in rows if r["group"] == gi]
        if sub:
            summary_rows.append({
                "group": gname, "n": len(sub),
                "acc": float(np.mean([r["acc"] for r in sub])),
                "miou": float(np.mean([r["miou"] for r in sub]))})
    all_row = {"group": "all", "n": len(rows),
               "acc": float(np.mean([r["acc"] for r in rows])),
               "miou": float(np.mean([r["miou"] for r in rows]))}
    summary_rows.append(all_row)
    # threshold-detector operating points at false-alarm budgets — the
    # live counterpart of the reference's post-hoc Pd-by-FAR log mining
    # (uti_zy3_test_20240123.py:709-749); additive report row
    try:
        from onet_tpu.metrics.roc import fg_score, dr_at_far
        import jax.numpy as _jnp
        vt_all = np.concatenate([v for v, _ in det_scores])
        vd_all = np.concatenate([v for _, v in det_scores])
        lab_all = np.concatenate(det_labels)
        # fg branch: whichever raw branch argmax better matches GT overall
        raw_down = (vd_all > vt_all).astype(np.int32)
        fg_is_down = float(np.mean(raw_down == (lab_all > 0))) >= 0.5
        score = fg_score(_jnp.asarray(vt_all), _jnp.asarray(vd_all),
                         fg_is_down=fg_is_down)
        det = dr_at_far(score, _jnp.asarray(lab_all), (0.01, 0.05))
        for budget, (far_a, dr, thr) in det.items():
            summary_rows.append({
                "group": f"detector@far<={budget:g}", "n": len(rows),
                "dr": float(dr), "far": float(far_a),
                "threshold": float(thr)})
        logging.info("Detector operating points: %s",
                     {b: round(v[1], 4) for b, v in det.items()})
    except Exception as e:  # pragma: no cover - report stays usable
        logging.warning("detector rows skipped: %s", e)
    summary = pd.DataFrame(summary_rows)
    path = save_zy3_excel_report(out_path, rows, summary)
    logging.info("Overall testset Accuracy %.4f, mIoU %.4f",
                 all_row["acc"], all_row["miou"])
    if draw:
        # draw_test_res parity: epoch+metric-named 5x5 rgb/gt/pred/vt/vd
        # grids next to the Excel report (uti_zy3_test_20240123.py:42-97)
        from onet_tpu.report.curves import save_test_res_grids
        save_test_res_grids(
            os.path.dirname(out_path) or ".", model_name, rows,
            test_loss=0.0, acc=all_row["acc"],
            miou=all_row["miou"], epoch=epoch, draw_all=draw_all)
    return path, summary


def train(config: Zy3Config, train_ds: ArrayDataset, test_ds: ArrayDataset,
          *, policy: Policy = DEFAULT, mesh=None, log: bool = True):
    from onet_tpu.models.arch import get_arch
    arch = get_arch(config.arch, swin_window=config.swin_window,
                    swin_embed=config.swin_embed,
                    convnext_embed=config.convnext_embed,
                    transunet_embed=config.transunet_embed,
                    transunet_depth=config.transunet_depth)
    key = jax.random.key(config.seed)
    k_model, k_loop = jax.random.split(key)

    params, bn_state = arch.init(k_model, config.in_channels,
                                 weight_share=config.weight_share,
                                 base=config.base_channels)
    opt_state = adam_init(params)
    start_epoch = 0
    if config.restart_from:
        params, bn_state, start_epoch, opt_loaded = load_checkpoint(
            config.restart_from, params, bn_state, opt_template=opt_state)
        start_epoch += 1
        if opt_loaded is not None:
            opt_state = opt_loaded
        elif log:
            logging.warning("Checkpoint %s has no optimizer state; Adam "
                            "moments restart from zero", config.restart_from)
    fwd = None if arch.vanilla else arch.forward
    train_step = make_train_step(policy=policy, mesh=mesh, forward=fwd,
                                 loss=config.loss)
    eval_batch = make_zy3_eval(policy=policy, forward=fwd, loss=config.loss)

    if log:
        setup_logging(config.out_root, config.model_name)

    history = {"loss": [], "eval": {}}
    mark = datehour_mark()
    from onet_tpu.train.preempt import PreemptGuard
    guard = PreemptGuard(config.preempt_save).install()
    try:
        for epoch in range(start_epoch, config.epoch_nums):
            lr = cosine_warm_restarts(config.base_lr, epoch, t0=config.t0,
                                      t_mult=config.t_mult, eta_min=config.eta_min)
            losses = []
            ek = jax.random.fold_in(k_loop, epoch)
            for bi, batch in enumerate(batch_iterator(train_ds, config.batch_sz,
                                                      key=ek)):
                x = batch["imgs"]
                if config.aug:
                    x = augment_batch(jax.random.fold_in(ek, bi), x)
                params, bn_state, opt_state, loss = train_step(
                    params, bn_state, opt_state, x, lr)
                losses.append(loss)
                if guard.triggered:
                    break
            if guard.triggered:
                # drain: checkpoint with the interrupted epoch recorded as
                # NOT done; restart_from=<path> redoes it in full
                path = os.path.join(
                    config.out_root,
                    f"{config.model_name}_preempt{max(epoch - 1, 0)}"
                    f"_{mark}.npz")
                from onet_tpu.models.arch import arch_meta
                save_checkpoint(path, params, bn_state, epoch - 1,
                                opt_state=opt_state, meta=arch_meta(config))
                history["preempted"] = epoch
                msg = (f"SIGTERM: preempted at epoch {epoch}; checkpoint "
                       f"saved -> {path} (pass restart_from to continue)")
                if log:
                    print(msg)
                    logging.warning(msg)
                break
            loss_epoch = float(jnp.mean(jnp.stack(losses)))
            history["loss"].append(loss_epoch)

            metrics, _ = evaluate_zy3(eval_batch, params, bn_state, test_ds,
                                      config.batch_sz)
            history["eval"][epoch] = metrics
            line = ("%s===Epoch: %04d, Training loss: %.2E, lr: %.2E,"
                    "miou %.4f acc %.4f" % (config.model_name, epoch, loss_epoch,
                                            lr, metrics["miou"], metrics["acc"]))
            if log:
                print(line)
                logging.info(line)

            if epoch == config.epoch_nums - 1 or epoch in config.save_epochs:
                path = os.path.join(config.out_root,
                                    f"{config.model_name}_epoch{epoch}_{mark}.npz")
                from onet_tpu.models.arch import arch_meta
                save_checkpoint(path, params, bn_state, epoch,
                                opt_state=opt_state, meta=arch_meta(config))
                if log:
                    logging.info("Saved checkpoint: %s", path)

    finally:
        guard.restore()
    if log:
        from onet_tpu.report.curves import save_training_curves

        save_training_curves(
            os.path.join(config.out_root,
                         f"{config.model_name}_train_loss_{mark}.png"),
            history["loss"], history["eval"])
    return params, bn_state, history


def make_supervised_train_step(*, policy: Policy = DEFAULT, mesh=None):
    """Supervised fine-tuning step (ADDITIVE: the reference defines the
    supervised ZY-3 datasets, dataloader/zy3_cloud_thumbnailv5_20240304.py
    :124-216, but no supervised objective — this pairs them with a
    pixel-wise cross-entropy on the class-probability map S)."""
    from onet_tpu.train.optim import adam_update
    from onet_tpu.train.steps import _make_reshard  # reuse sharding plumbing

    def train_step(params, bn_state, opt_state, x, labels, lr):
        def loss_fn(p):
            out, new_bn = onet_forward(p, bn_state, x, train=True,
                                       policy=policy)
            y = labels.astype(jnp.int32)
            logp = jnp.log(jnp.clip(out.S, 1e-8, 1.0))
            ce = -jnp.mean(jnp.take_along_axis(logp, y[..., None],
                                               axis=-1))
            return ce, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = adam_update(grads, opt_state, lr)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1, 2))
    from onet_tpu.core.mesh import batch_sharding, replicated
    rep = replicated(mesh)
    return jax.jit(train_step, donate_argnums=(0, 1, 2),
                   in_shardings=(rep, rep, rep, batch_sharding(mesh),
                                 batch_sharding(mesh, rank=3), None),
                   out_shardings=(rep, rep, rep, None))
