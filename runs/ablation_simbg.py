"""Ablation-family study on the simulated-clutter (radar) workload.

The reference wires its ablation families only through the zy3 runner
(Train_Onet_on_zy3_20240606.py:225-382), but the paper's radar-side
claims rest on the simclutter recipe
(Train_Onet_on_simclutter_20250407.py:619-687). This study drives every
rebuilt family through a UNIFORM reduced simclutter protocol — 60
unsupervised epochs on SNR5-10 clutter, the same budget as the IIC /
InfoSeg comparison rows (runs/{iic,infoseg}_simbg_high) — and reports:

* per-PSNR(0-10) averaged (acc, miou, dr, far, tiou) via the sweep
  harness (train.sweeps.test_by_snr with the family's forward), and
* the zero-shot NAU rain transfer row on 224^2 synthetic frames (the
  transformer families' geometry: swin window 7 needs stage sides
  divisible by 7 — 224 gives 56/28/14/7; the real NAU frames are 200^2
  and only the conv families accept those).

Families whose final checkpoint already exists under their out_root are
NOT retrained — the study resumes into the eval phase (wall_s is then
re-read from the driver log's first/last epoch timestamps).

Checkpoints carry arch metadata, so `run serve/nau/sweep --model(-dir)`
rebuild each family automatically afterwards.

Writes runs/ablation_simbg.json: per-family param count, train wall-time,
final loss, sweep averages, NAU transfer row.

Run: PYTHONPATH=.:$PYTHONPATH python runs/ablation_simbg.py
(append, don't replace: the axon TPU plugin registers via the PYTHONPATH
sitecustomize)
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.data.nau import synthesize_nau_rain
from onet_tpu.models.arch import get_arch
from onet_tpu.models.unet import param_count
from onet_tpu.train.nau import test_naurain
from onet_tpu.train.simclutter import SimclutterConfig, train
from onet_tpu.train.sweeps import per_snr_datasets, test_by_snr

FAMILIES = {
    # name -> SimclutterConfig overrides (reference runner it stands for)
    "onet_vanilla": {},                          # the main model
    "onet_lhd_twin": {"weight_share": False},    # train_lhd_model
    "onet_rsn": {"loss": "rsn"},                 # train_rsn_model
    "onet_swin": {"arch": "swin"},               # train_outc_model
    "onet_convnext": {"arch": "convnext"},       # ConvNeXt variant
    "onet_transunet": {"arch": "transunet"},     # Onet_Trans_Unet import
}

EPOCHS = 60          # the comparison-row budget (IIC/InfoSeg rows)
SWEEP_FRAMES = 50    # frames per PSNR level for the eval sweep


def _log_wall_s(out_root):
    """Train-loop wall time from the driver log's epoch timestamps."""
    logs = sorted(glob.glob(os.path.join(out_root, "*.log")))
    if not logs:
        return None
    stamps = re.findall(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+)\s*$",
                        open(logs[-1]).read(), re.M)
    if len(stamps) < 2:
        return None
    from datetime import datetime
    f = "%Y-%m-%d %H:%M:%S.%f"
    return (datetime.strptime(stamps[-1], f)
            - datetime.strptime(stamps[0], f)).total_seconds()


def main():
    sweep_data = per_snr_datasets(jax.random.key(7),
                                  frames_per_level=SWEEP_FRAMES)
    nau_ds, nau_ids = synthesize_nau_rain(jax.random.key(0), n=10, size=224)
    results = {}
    for name, kw in FAMILIES.items():
        out_root = f"runs/ablation_simbg/{name}"
        cfg = SimclutterConfig(model_name=name, out_root=out_root,
                               epoch_nums=EPOCHS, low_snr=5, high_snr=10,
                               eval_every=30, save_epochs=(), **kw)
        arch = get_arch(cfg.arch)
        params, _ = arch.init(jax.random.key(0), cfg.in_channels,
                              weight_share=cfg.weight_share)
        n_params = param_count(params)
        done = sorted(glob.glob(os.path.join(
            out_root, f"{name}_epoch_{EPOCHS - 1}_*.npz")))
        if done:
            from onet_tpu.core.checkpoint import load_arch_auto
            print(f"[ablation-simbg] {name}: resuming evals from {done[-1]}",
                  flush=True)
            _, params, bn_state, _ = load_arch_auto(done[-1])
            wall = _log_wall_s(out_root)
            logs = sorted(glob.glob(os.path.join(out_root, "*.log")))
            losses = re.findall(r"loss: ([\d.]+)", open(logs[-1]).read())
            history = {"loss": [float(losses[-1]) if losses else None]}
        else:
            t0 = time.time()
            params, bn_state, history = train(cfg, policy=BF16_COMPUTE)
            wall = time.time() - t0
        fwd = None if arch.vanilla else arch.forward
        sweep = test_by_snr(params, bn_state, sweep_data,
                            policy=BF16_COMPUTE, forward=fwd)
        nau = test_naurain(params, bn_state, nau_ds, policy=BF16_COMPUTE,
                           ids=nau_ids, forward=fwd)
        results[name] = {
            "params_m": round(n_params / 1e6, 2),
            "wall_s": round(wall, 1) if wall is not None else None,
            "final_loss": history["loss"][-1],
            "sweep_ave": {k: round(float(v), 4)
                          for k, v in sweep["ave"].items()},
            "nau_transfer": {k: round(float(v), 4) for k, v in nau.items()},
        }
        print(f"[ablation-simbg] {name}: {results[name]}", flush=True)
    with open("runs/ablation_simbg.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
