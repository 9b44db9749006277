"""Round-2+ quality pipeline: retrain stage-2 (high-SNR) and stage-1
(bias-tuned low-SNR) models, then run the two-stage composition eval
per PSNR level and the production per-SNR verify.

Reference recipe: the dead-but-documenting 2-model block at
Train_Onet_on_simclutter_20250407.py:672-685 (1st model on PSNR 0-2,
2nd on 5-10) and test_2nd_stage_simclutter (:296-418).

Run: PYTHONPATH=. python runs/quality_pipeline.py
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax

from onet_tpu.core.checkpoint import load_checkpoint
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init
from onet_tpu.train.simclutter import SimclutterConfig, train
from onet_tpu.train.sweeps import per_snr_datasets
from onet_tpu.train.two_stage import verify_two_stage


def latest(pattern):
    hits = sorted(glob.glob(pattern))
    return hits[-1] if hits else None


def train_if_missing(name, **kw):
    out_root = f"runs/{name}"
    ck = latest(f"{out_root}/*.npz")
    if ck:
        print(f"[pipeline] reuse {ck}", flush=True)
        return ck
    t0 = time.time()
    cfg = SimclutterConfig(model_name=name, out_root=out_root,
                           save_epochs=(), **kw)
    train(cfg, policy=BF16_COMPUTE)
    print(f"[pipeline] trained {name} in {(time.time()-t0)/60:.1f} min",
          flush=True)
    return latest(f"{out_root}/*.npz")


def load(ck):
    p, b = onet_init(jax.random.key(0), 1)
    p, b, _ = load_checkpoint(ck, p, b)
    return p, b


def main():
    # stage 2: the high-SNR production model (reference :684: PSNR 5-10)
    ck2 = train_if_missing("simclutter_high", epoch_nums=301,
                           low_snr=5, high_snr=10, eval_every=50)
    # stage 1 candidates: reference recipe bias=0 plus the bias sweep's
    # round-2 operating points
    ck1s = {}
    for bias in (0.0, 0.20):
        tag = f"stage1_bias{bias:.2f}"
        ck1s[tag] = train_if_missing(tag, epoch_nums=301,
                                     low_snr=0, high_snr=2,
                                     eval_every=50, bias=bias)
    p2, b2 = load(ck2)
    data = per_snr_datasets(jax.random.key(7), frames_per_level=30,
                            levels=(0, 1, 2, 4, 6, 8, 10))
    out = {}
    for tag, ck in ck1s.items():
        p1, b1 = load(ck)
        rep = verify_two_stage(p1, b1, p2, b2, data, policy=BF16_COMPUTE)
        out[tag] = rep
        a1, a2 = rep["ave"]["stage1"], rep["ave"]["stage2"]
        print(f"[2stage] {tag}:", flush=True)
        print(f"  stage1 ave: acc {a1['acc']:.4f} dr {a1['dr']:.4f} "
              f"far {a1['far']:.2E} tiou {a1['tiou']:.4f}")
        print(f"  stage2 ave: acc {a2['acc']:.4f} dr {a2['dr']:.4f} "
              f"far {a2['far']:.2E} tiou {a2['tiou']:.4f}")
        s2_0 = rep[0]["stage2"]
        s1_0 = rep[0]["stage1"]
        print(f"  PSNR0: stage1 dr {s1_0['dr']:.4f} far {s1_0['far']:.2E} "
              f"-> stage2 dr {s2_0['dr']:.4f} far {s2_0['far']:.2E}",
              flush=True)
    with open("runs/two_stage_report.json", "w") as f:
        json.dump({str(k): v for k, v in out.items()}, f, indent=1,
                  default=float)
    print("[pipeline] wrote runs/two_stage_report.json", flush=True)


if __name__ == "__main__":
    main()
