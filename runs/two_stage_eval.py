"""Two-stage composition study: bias-tuned stage-1 models x the converged
high-SNR stage-2 model, per-PSNR (reference recipe:
Train_Onet_on_simclutter_20250407.py:296-418,672-685).

Run: PYTHONPATH=. python runs/two_stage_eval.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax

from onet_tpu.core.checkpoint import load_checkpoint
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init
from onet_tpu.train.sweeps import per_snr_datasets
from onet_tpu.train.two_stage import verify_two_stage

STAGE2 = "runs/simclutter_high/onet_rayleigh_psnr5-10_epoch_300_2026_0816_08.npz"


def latest(pattern):
    hits = sorted(glob.glob(pattern))
    return hits[-1] if hits else None


def main():
    p2, b2 = onet_init(jax.random.key(0), 1)
    p2, b2, _ = load_checkpoint(STAGE2, p2, b2)
    data = per_snr_datasets(jax.random.key(7), frames_per_level=30,
                            levels=(0, 1, 2, 4, 6, 8, 10))
    out = {}
    for tag in ("r2_bias0.20", "r2_bias0.25", "bias0.00_lr5e-6"):
        ck = latest(f"runs/lowsnr_sweep/{tag}/*.npz")
        if not ck:
            print(f"[2stage] no checkpoint for {tag}, skip", flush=True)
            continue
        p1, b1 = onet_init(jax.random.key(0), 1)
        p1, b1, _ = load_checkpoint(ck, p1, b1)
        rep = verify_two_stage(p1, b1, p2, b2, data, policy=BF16_COMPUTE)
        out[tag] = rep
        a1, a2 = rep["ave"]["stage1"], rep["ave"]["stage2"]
        print(f"[2stage] {tag}:")
        print(f"  stage1 ave: acc {a1['acc']:.4f} dr {a1['dr']:.4f} "
              f"far {a1['far']:.2E} tiou {a1['tiou']:.4f}")
        print(f"  stage2 ave: acc {a2['acc']:.4f} dr {a2['dr']:.4f} "
              f"far {a2['far']:.2E} tiou {a2['tiou']:.4f}", flush=True)
    with open("runs/lowsnr_sweep/two_stage_report.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
