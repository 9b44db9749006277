"""Low-SNR (PSNR 0-2) recipe study: sweep the complement bias and lr.

Reference recipe: 301 epochs, Adam 5e-6 (x0.5/100), PSNR 0-2 loaders
(Train_Onet_on_simclutter_20250407.py:668-669); the Onet `bias` attr
(Onet_vanilla_20240606.py:172,180) is the documented low-SNR knob.
Triage pass: 150 epochs per config, metrics JSON per config.

Run: PYTHONPATH=. python runs/lowsnr_sweep.py [--epochs N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.train.simclutter import SimclutterConfig, train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--out", default="runs/lowsnr_sweep")
    args = ap.parse_args()

    configs = [
        ("bias0.00_lr5e-6", dict(bias=0.0, base_lr=5e-6)),
        ("bias0.10_lr5e-6", dict(bias=0.1, base_lr=5e-6)),
        ("bias0.25_lr5e-6", dict(bias=0.25, base_lr=5e-6)),
        ("bias0.00_lr2e-5", dict(bias=0.0, base_lr=2e-5)),
    ]
    if os.environ.get("LOWSNR_ROUND2"):
        # triage verdict: bias sharpens acc/far dramatically; round 2 runs
        # the full reference schedule at intermediate biases
        configs = [
            ("r2_bias0.15", dict(bias=0.15, base_lr=5e-6)),
            ("r2_bias0.20", dict(bias=0.20, base_lr=5e-6)),
            ("r2_bias0.25", dict(bias=0.25, base_lr=5e-6)),
        ]
    os.makedirs(args.out, exist_ok=True)
    for name, kw in configs:
        t0 = time.time()
        cfg = SimclutterConfig(
            model_name=f"lowsnr_{name}",
            epoch_nums=args.epochs,
            low_snr=0, high_snr=2,
            eval_every=25,
            out_root=os.path.join(args.out, name),
            save_epochs=(),
            **kw)
        _, _, history = train(cfg, policy=BF16_COMPUTE)
        final = history["eval"][max(history["eval"])]
        rec = {"name": name, **kw, "epochs": args.epochs,
               "final": final, "wall_min": round((time.time() - t0) / 60, 1),
               "evals": {str(k): v for k, v in history["eval"].items()}}
        with open(os.path.join(args.out, f"{name}.json"), "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[sweep] {name}: {final} ({rec['wall_min']} min)", flush=True)


if __name__ == "__main__":
    main()
