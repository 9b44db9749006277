"""Ablation-family study on the ZY-3 workload (the reference's protocol).

The reference runs every architecture/objective ablation through the SAME
zy3 driver: train_rsn_model (random-sampling negatives,
Train_Onet_on_zy3_20240606.py:225-269), train_lhd_model (twin, no weight
share, :270-311), train_outc_model (Swin-Unet backbone, :313-382), and a
commented ConvNeXt variant (:22-28) — 11 unsupervised epochs, Adam 1e-4 +
cosine warm restarts, per-epoch Hungarian-aligned eval. The ablation model
modules are git-absent, so the families here are the rebuilt ones
(models/arch.py, models/onet.py::LOSSES) and the scenes are the synthetic
ZY-3 stand-ins (data/zy3.py::synthesize_zy3; the snapshot ships no real
imagery).

Writes runs/ablation_zy3.json: per-family final acc/miou/dr/far, train
wall-time, param count.

Run: PYTHONPATH=.:$PYTHONPATH python runs/ablation_zy3.py
(append, don't replace: the axon TPU plugin registers via the PYTHONPATH
sitecustomize)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.data.zy3 import synthesize_zy3
from onet_tpu.models.arch import get_arch
from onet_tpu.models.unet import param_count
from onet_tpu.train.zy3 import Zy3Config, train

FAMILIES = {
    # name -> Zy3Config overrides (reference runner it stands for)
    "onet_vanilla": {},                          # the main model
    "onet_lhd_twin": {"weight_share": False},    # train_lhd_model
    "onet_rsn": {"loss": "rsn"},                 # train_rsn_model
    "onet_swin": {"arch": "swin"},               # train_outc_model
    "onet_convnext": {"arch": "convnext"},       # ConvNeXt variant
    "onet_transunet": {"arch": "transunet"},     # Onet_Trans_Unet import
}


def main():
    train_ds, _ = synthesize_zy3(jax.random.key(0), n=250)
    test_ds, _ = synthesize_zy3(jax.random.key(1), n=50)
    results = {}
    for name, kw in FAMILIES.items():
        cfg = Zy3Config(model_name=name, out_root=f"runs/ablation_zy3/{name}",
                        save_epochs=(), **kw)
        arch = get_arch(cfg.arch)
        params, _ = arch.init(jax.random.key(0), cfg.in_channels,
                              weight_share=cfg.weight_share)
        n_params = param_count(params)
        t0 = time.time()
        _, _, history = train(cfg, train_ds, test_ds, policy=BF16_COMPUTE)
        wall = time.time() - t0
        final = history["eval"][max(history["eval"])]
        results[name] = {
            "params_m": round(n_params / 1e6, 2),
            "wall_s": round(wall, 1),
            "final_loss": history["loss"][-1],
            **{k: round(float(v), 4) for k, v in final.items()},
        }
        print(f"[ablation] {name}: {results[name]}", flush=True)
    with open("runs/ablation_zy3.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
