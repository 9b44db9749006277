"""Per-SNR training/evaluation sweeps and checkpoint-directory verification.

Reference counterparts (Train_Onet_on_simclutter_20250407.py):
* ``train_by_snr``          — train_onet_by_snr (:456-479): train a fresh
  copy of the same init per PSNR level, then verify across all levels;
* ``test_by_snr``           — test_onet_by_snr / verify_onet_simclutter
  (:420-454,480-510): per-PSNR metric dict with an 'ave' row;
* ``verify_checkpoint_dir`` — test_model_performance (:512-524): glob a
  checkpoint directory, load each model, run the per-PSNR sweep.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import jax

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.train.simclutter import SimclutterConfig, train
from onet_tpu.train.steps import make_eval_step
from onet_tpu.train.two_stage import verify_single_stage


def per_snr_datasets(key, levels=range(0, 11), frames_per_level: int = 150,
                     crop: int = 224):
    """{psnr: full ArrayDataset} for sweep evaluation (no train split)."""
    out = {}
    for lvl in levels:
        tr, te = simclutter_datasets(jax.random.fold_in(key, 1000 + lvl),
                                     low_snr=lvl, high_snr=lvl,
                                     train_frac=1.0,
                                     frames_per_level=frames_per_level,
                                     crop=crop)
        out[lvl] = tr
    return out


def test_by_snr(params, bn_state, datasets_by_psnr, *, batch_sz: int = 10,
                policy: Policy = DEFAULT, forward=None) -> Dict:
    """``forward`` swaps the backbone (models/arch.py — every family keeps
    the OnetOutput contract); default is the vanilla conv U-Net."""
    eval_step = make_eval_step(policy=policy, align="flip", forward=forward)
    return verify_single_stage(eval_step, params, bn_state,
                               datasets_by_psnr, batch_sz)


def threshold_sweep_by_snr(params, bn_state, datasets_by_psnr, *,
                           far_budgets=(1e-3, 1e-2, 5e-2, 1e-1),
                           policy: Policy = DEFAULT, forward=None) -> Dict:
    """Per-PSNR detection rates at explicit FAR budgets via the
    projection-threshold detector (metrics/roc.py — additive; the
    reference's argmax is the threshold-0 point). Returns
    {psnr: {"argmax": {...}, "thresh": {budget: {"far", "dr"}}}}."""
    import jax as _jax
    import jax.numpy as _jnp

    from onet_tpu.metrics.roc import fg_score, dr_at_far
    from onet_tpu.metrics.segmentation import align_labels_by_accuracy
    from onet_tpu.models.onet import onet_forward, predict_label

    model_fwd = forward or onet_forward

    @_jax.jit
    def fwd(x):
        out, _ = model_fwd(params, bn_state, x, train=False,
                           policy=policy)
        return out.Vt, out.Vd, predict_label(out.S)

    report = {}
    for psnr, ds in datasets_by_psnr.items():
        x, labels = ds["imgs"], ds["labels"]
        vt, vd, raw = fwd(x)
        aligned = align_labels_by_accuracy(raw, labels)
        fg_is_down = bool(_jnp.mean((raw == aligned).astype(_jnp.float32))
                          > 0.5)
        score = fg_score(vt, vd, fg_is_down=fg_is_down)
        y = labels > 0
        tp = _jnp.sum((aligned > 0) & y)
        fp = _jnp.sum((aligned > 0) & ~y)
        rep = dr_at_far(score, labels, far_budgets)
        report[psnr] = {
            "argmax": {"dr": float(tp / _jnp.maximum(_jnp.sum(y), 1)),
                       "far": float(fp / _jnp.maximum(_jnp.sum(~y), 1))},
            "thresh": {float(k): {"far": v[0], "dr": v[1]}
                       for k, v in rep.items()},
        }
    return report


def train_by_snr(base_config: SimclutterConfig, *, levels=range(0, 11),
                 policy: Policy = DEFAULT) -> Dict:
    """Train an identically-initialized model per PSNR level; returns
    {psnr: (params, bn_state, history)}. The same seed re-initializes each
    level (reference reloads init_param_dict, :464,474)."""
    results = {}
    for lvl in levels:
        import dataclasses
        cfg = dataclasses.replace(
            base_config, low_snr=lvl, high_snr=lvl,
            out_root=os.path.join(base_config.out_root, f"onet_snr_{lvl:02d}"))
        results[lvl] = train(cfg, policy=policy, log=False)
    return results


def verify_checkpoint_dir(model_root: str, *, datasets_by_psnr=None,
                          batch_sz: int = 10, policy: Policy = DEFAULT) -> Dict:
    """Evaluate every checkpoint (.npz and reference .pt/.pytorch) in a
    directory across all PSNR levels. Each file rebuilds its OWN model
    via load_arch_auto (arch metadata for the ablation families, shape
    inference for vanilla/torch), so mixed-family directories verify in
    one pass — the generalization of the reference's
    test_model_performance glob
    (Train_Onet_on_simclutter_20250407.py:512-524)."""
    from onet_tpu.core.checkpoint import load_arch_auto
    from onet_tpu.core.torch_import import TORCH_EXTS

    # the reference globs *.pytorch; accept its files alongside ours
    files = sorted(p for ext in (".npz",) + tuple(TORCH_EXTS)
                   for p in glob.glob(os.path.join(model_root, "*" + ext)))
    if datasets_by_psnr is None:
        datasets_by_psnr = per_snr_datasets(jax.random.key(7))
    report = {}
    for f in files:
        arch, params, bn_state, epoch = load_arch_auto(f)
        report[os.path.basename(f)] = {
            "epoch": epoch,
            "arch": arch.name,
            "per_snr": test_by_snr(
                params, bn_state, datasets_by_psnr, batch_sz=batch_sz,
                policy=policy,
                forward=None if arch.vanilla else arch.forward),
        }
    return report
