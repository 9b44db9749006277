"""Controlled torch-vs-jax low-SNR (PSNR 0-2) study on IDENTICAL data and
IDENTICAL initial weights.

Question (VERDICT round 1, item 4): is the low detection rate at PSNR 0-2
a defect of the TPU port, or inherent to the reference recipe/objective?
Method: train the torch oracle (tests/torch_mirror.py — the reference
architecture re-stated) and the JAX model from the SAME torch-initialized
weights, on the SAME frames in the SAME batch order, with the same Adam
(lr, betas, eps match; optim.py docstring), and compare the final
operating points (acc/dr/far). If both implementations land on the same
dr/far knee, the gap is the recipe's, not the port's.

Scale: base=16 at 64^2 (CPU-feasible); the knee behavior is scale-stable
in the bias sweeps (runs/lowsnr_sweep).

Run: PYTHONPATH=. python runs/torch_jax_controlled.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import torch

from onet_tpu.models.onet import onet_init
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step, make_eval_step
from onet_tpu.data.simclutter import simclutter_datasets
from tests.torch_mirror import MirrorOnet, t_loss
from tests.test_model_parity import copy_params_from_torch

BASE, HW, BATCH = 16, 64, 10
EPOCHS, LR, EVAL_EVERY = 100, 2e-5, 25


def torch_metrics(tnet, x, labels):
    from onet_tpu.metrics.segmentation import (
        align_labels_by_accuracy, evaluate_binary_segmentation)
    tnet.eval()
    with torch.no_grad():
        _, _, _, _, s = tnet(torch.tensor(x).permute(0, 3, 1, 2))
    pred = jnp.asarray(np.array(s.argmax(1).numpy(), copy=True))
    lab = jnp.asarray(labels)
    pred = align_labels_by_accuracy(pred, lab)
    tnet.train()
    return {k: float(v) for k, v in
            evaluate_binary_segmentation(pred, lab).items()}


def main():
    key = jax.random.key(1981)
    train_ds, test_ds = simclutter_datasets(key, low_snr=0, high_snr=2,
                                            frames_per_level=15, crop=HW)
    xtr = np.asarray(train_ds["imgs"], np.float32)
    xte = np.asarray(test_ds["imgs"], np.float32)
    lte = np.asarray(test_ds["labels"])
    print(f"[ctrl] {xtr.shape[0]} train / {xte.shape[0]} test frames",
          flush=True)

    torch.manual_seed(1981)
    tnet = MirrorOnet(cin=1, base=BASE, share=True)
    params, bn = onet_init(jax.random.key(0), 1, base=BASE)
    params, bn = copy_params_from_torch(tnet, params, bn)

    topt = torch.optim.Adam(tnet.parameters(), lr=LR)
    jopt = adam_init(params)
    jstep = make_train_step()
    jeval = make_eval_step(align="flip")

    order_rng = np.random.default_rng(7)
    hist = {"torch": {}, "jax": {}}
    t0 = time.time()
    for epoch in range(EPOCHS):
        perm = order_rng.permutation(xtr.shape[0])
        for i in range(0, len(perm) - BATCH + 1, BATCH):
            xb = xtr[perm[i:i + BATCH]]
            # torch step (reference loss form)
            xt = torch.tensor(xb).permute(0, 3, 1, 2)
            lt, vt, ld, vd, s = tnet(xt)
            loss_t = t_loss(lt, s, ld)
            topt.zero_grad()
            loss_t.backward()
            topt.step()
            # jax step on the same batch
            params, bn, jopt, loss_j = jstep(params, bn, jopt,
                                             jnp.asarray(xb), LR)
        if epoch % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            mt = torch_metrics(tnet, xte, lte)
            mj, _, _ = jeval(params, bn, jnp.asarray(xte), jnp.asarray(lte))
            mj = {k: float(v) for k, v in mj.items()}
            hist["torch"][epoch] = mt
            hist["jax"][epoch] = mj
            print(f"[ctrl] ep{epoch:03d} "
                  f"torch acc {mt['acc']:.4f} dr {mt['dr']:.4f} "
                  f"far {mt['far']:.2E} | "
                  f"jax acc {mj['acc']:.4f} dr {mj['dr']:.4f} "
                  f"far {mj['far']:.2E} "
                  f"(loss_t {float(loss_t):.4f} loss_j {float(loss_j):.4f})",
                  flush=True)
    hist["wall_min"] = round((time.time() - t0) / 60, 1)
    with open("runs/torch_jax_controlled.json", "w") as f:
        json.dump(hist, f, indent=1)
    print("[ctrl] wrote runs/torch_jax_controlled.json", flush=True)


if __name__ == "__main__":
    main()
