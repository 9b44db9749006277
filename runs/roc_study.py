"""Projection-threshold detector study at PSNR 0-2 (and across levels).

The argmax detector (the reference's only operating point) sits at one
(dr, far) pair; sweeping a threshold over the foreground projection score
buys detection rate under an explicit false-alarm budget. Reports dr at
FAR budgets for the trained low-SNR (stage-1) and high-SNR models.

Run: PYTHONPATH=. python runs/roc_study.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import load_checkpoint
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init, onet_forward, predict_label
from onet_tpu.metrics.roc import fg_score, dr_at_far
from onet_tpu.metrics.segmentation import align_labels_by_accuracy
from onet_tpu.train.sweeps import per_snr_datasets

BUDGETS = (1e-3, 1e-2, 5e-2, 1e-1)


def study(ck, data, tag):
    params, bn = onet_init(jax.random.key(0), 1)
    params, bn, _ = load_checkpoint(ck, params, bn)

    @jax.jit
    def fwd(x):
        out, _ = onet_forward(params, bn, x, train=False,
                              policy=BF16_COMPUTE)
        return out.Vt, out.Vd, predict_label(out.S)

    rows = {}
    for psnr, ds in data.items():
        x, labels = ds["imgs"], ds["labels"]
        vt, vd, raw = fwd(x)
        aligned = align_labels_by_accuracy(raw, labels)
        fg_is_down = bool(jnp.mean((raw == aligned).astype(jnp.float32))
                          > 0.5)  # flip test: did argmax need flipping?
        # argmax labels: fg = class1 when not flipped
        score = fg_score(vt, vd, fg_is_down=fg_is_down)
        # argmax operating point for comparison
        pred = aligned
        y = labels > 0
        tp = jnp.sum((pred > 0) & y)
        fp = jnp.sum((pred > 0) & ~y)
        arg_dr = float(tp / jnp.maximum(jnp.sum(y), 1))
        arg_far = float(fp / jnp.maximum(jnp.sum(~y), 1))
        rep = dr_at_far(score, labels, BUDGETS)
        rows[psnr] = {"argmax": {"dr": arg_dr, "far": arg_far},
                      "thresh": {str(k): {"far": v[0], "dr": v[1]}
                                 for k, v in rep.items()}}
        line = " ".join(f"far<={k:g}: dr {v[1]:.3f}" for k, v in rep.items())
        print(f"[roc] {tag} psnr{psnr}: argmax dr {arg_dr:.3f} "
              f"far {arg_far:.1E} | {line}", flush=True)
    return rows


def main():
    data = per_snr_datasets(jax.random.key(11), frames_per_level=40,
                            levels=(0, 1, 2, 5, 10))
    out = {}
    for tag, pat in (("stage1_bias0.00", "runs/stage1_bias0.00/*.npz"),
                     ("stage1_bias0.20", "runs/stage1_bias0.20/*.npz"),
                     ("high_snr", "runs/simclutter_high/*.npz")):
        cks = sorted(glob.glob(pat))
        if not cks:
            print(f"[roc] no checkpoint for {tag}", flush=True)
            continue
        out[tag] = study(cks[-1], data, tag)
    with open("runs/roc_report.json", "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("[roc] wrote runs/roc_report.json", flush=True)


if __name__ == "__main__":
    main()
