"""Controlled torch-vs-jax TWO-STAGE study (VERDICT round 2, item 4).

Round-2 finding: the reference's 2-stage composition
(Train_Onet_on_simclutter_20250407.py:296-418,672-685 — stage-1 trained on
PSNR 0-2, stage-2 on 5-10, stage-1's renormalized foreground projection fed
to stage-2) SUPPRESSES low-SNR detections (dr -> 0) in the JAX build.
Open question: port artifact or recipe-inherent?

Method: train BOTH stages in BOTH frameworks from identical
torch-initialized weights on identical frames in identical batch order
(the round-2 controlled-study protocol, runs/torch_jax_controlled.py),
then run the full composition in BOTH frameworks on the same test frames:
torch composes exactly like the reference (re_assign_label flip test,
fg map = Vd if labels unchanged else Vt, per-frame min-max renormalize);
jax uses train/two_stage.py::make_two_stage_eval. If torch's stage-2 also
drives dr -> 0, the suppression is the recipe's.

Run: PYTHONPATH=. python runs/two_stage_controlled.py
Scale: base=16 at 64^2 (CPU-feasible; knee behavior is scale-stable).
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

from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.metrics.segmentation import (
    align_labels_by_accuracy, evaluate_binary_segmentation)
from onet_tpu.models.onet import onet_init
from onet_tpu.ops.normalize import minmax_per_frame
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step
from onet_tpu.train.two_stage import make_two_stage_eval
from tests.test_model_parity import copy_params_from_torch
from tests.torch_mirror import MirrorOnet, t_loss

BASE, HW, BATCH, LR = 16, 64, 10, 2e-5
EPOCHS1, EPOCHS2 = 100, 60


def train_pair(tag, seed, train_x, epochs):
    """Train (torch, jax) models from the same init on the same batches."""
    torch.manual_seed(seed)
    tnet = MirrorOnet(cin=1, base=BASE, share=True)
    params, bn = onet_init(jax.random.key(0), 1, base=BASE)
    params, bn = copy_params_from_torch(tnet, params, bn)
    topt = torch.optim.Adam(tnet.parameters(), lr=LR)
    jopt = adam_init(params)
    jstep = make_train_step()
    order = np.random.default_rng(seed)
    t0 = time.time()
    for ep in range(epochs):
        perm = order.permutation(train_x.shape[0])
        for i in range(0, len(perm) - BATCH + 1, BATCH):
            xb = train_x[perm[i:i + BATCH]]
            xt = torch.tensor(xb).permute(0, 3, 1, 2)
            lt, vt, ld, vd, s = tnet(xt)
            loss_t = t_loss(lt, s, ld)
            topt.zero_grad()
            loss_t.backward()
            topt.step()
            params, bn, jopt, loss_j = jstep(params, bn, jopt,
                                             jnp.asarray(xb), LR)
        if ep % 20 == 0 or ep == epochs - 1:
            print(f"[2ctrl] {tag} ep{ep:03d} loss_t {float(loss_t):.4f} "
                  f"loss_j {float(loss_j):.4f} "
                  f"({(time.time() - t0) / 60:.1f} min)", flush=True)
    return tnet, (params, bn)


def t_forward(tnet, x):
    tnet.eval()
    with torch.no_grad():
        lt, vt, ld, vd, s = tnet(torch.tensor(x).permute(0, 3, 1, 2))
    tnet.train()
    to = lambda t: jnp.asarray(np.array(t.numpy(), copy=True))
    return to(vt[:, 0]), to(vd[:, 0]), to(s.argmax(1))


def torch_compose(tnet1, tnet2, x, labels):
    """The reference 2-stage recipe on the torch oracles
    (test_2nd_stage_simclutter, :296-390)."""
    vt1, vd1, raw1 = t_forward(tnet1, x)
    lab = jnp.asarray(labels)
    pred1 = align_labels_by_accuracy(raw1, lab)
    m1 = evaluate_binary_segmentation(pred1, lab)
    flipped = bool(jnp.any(raw1 != pred1))
    fg = vt1 if flipped else vd1                      # :327-330
    x2 = np.asarray(minmax_per_frame(fg[..., None]), np.float32)
    _, _, raw2 = t_forward(tnet2, x2)
    pred2 = align_labels_by_accuracy(raw2, lab)
    m2 = evaluate_binary_segmentation(pred2, lab)
    f = lambda m: {k: float(v) for k, v in m.items()}
    return f(m1), f(m2)


def main():
    key = jax.random.key(1981)
    tr1, te1 = simclutter_datasets(key, low_snr=0, high_snr=2,
                                   frames_per_level=15, crop=HW)
    tr2, _ = simclutter_datasets(jax.random.key(77), low_snr=5, high_snr=10,
                                 frames_per_level=10, crop=HW)
    x1 = np.asarray(tr1["imgs"], np.float32)
    x2 = np.asarray(tr2["imgs"], np.float32)
    xte = np.asarray(te1["imgs"], np.float32)
    lte = np.asarray(te1["labels"])
    print(f"[2ctrl] stage1 {x1.shape[0]} fr (PSNR0-2), "
          f"stage2 {x2.shape[0]} fr (PSNR5-10), test {xte.shape[0]}",
          flush=True)

    tnet1, (p1, b1) = train_pair("stage1", 1981, x1, EPOCHS1)
    tnet2, (p2, b2) = train_pair("stage2", 1982, x2, EPOCHS2)

    # --- compose in torch (reference recipe) ------------------------------
    tm1, tm2 = torch_compose(tnet1, tnet2, xte, lte)

    # --- compose in jax ----------------------------------------------------
    ev = make_two_stage_eval()
    jm1, jm2, _, _, _ = ev(p1, b1, p2, b2, jnp.asarray(xte),
                           jnp.asarray(lte))
    jm1 = {k: float(v) for k, v in jm1.items()}
    jm2 = {k: float(v) for k, v in jm2.items()}

    out = {"protocol": {"base": BASE, "hw": HW, "epochs": [EPOCHS1, EPOCHS2],
                        "lr": LR, "test_frames": int(xte.shape[0]),
                        "test_psnr": "0-2"},
           "torch": {"stage1": tm1, "stage2": tm2},
           "jax": {"stage1": jm1, "stage2": jm2}}
    print(json.dumps(out, indent=1), flush=True)
    with open("runs/two_stage_controlled.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[2ctrl] wrote runs/two_stage_controlled.json", flush=True)


if __name__ == "__main__":
    main()
