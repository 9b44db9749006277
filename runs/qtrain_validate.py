"""Full-size int8-TRAINING accuracy gate on the real chip.

Trains the production model twice from the same init on the same
device-generated PSNR 5-10 data — once exact bf16, once with int8 conv
arithmetic (models/qtrain.py) — and compares the CONVERGED models:
held-out mask agreement, metric deltas, and both loss curves. This is the
training-side analogue of runs/quant_validate.py's serving gate.

Run: PYTHONPATH=.:$PYTHONPATH python runs/qtrain_validate.py [level]
     (level: fwd | fwd+dx; default fwd+dx — the fastest mode is the one
     that must pass)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.data.arrays import batch_iterator
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.models.onet import onet_init
from onet_tpu.train.optim import adam_init, step_decay
from onet_tpu.train.steps import make_train_step, make_eval_step

EPOCHS, BATCH, LR = 120, 10, 5e-6
FRAMES = 40


def train_one(tag, quantized, params0, bn0, train_ds):
    p = jax.tree.map(lambda a: jnp.array(a, copy=True), params0)
    b = jax.tree.map(lambda a: jnp.array(a, copy=True), bn0)
    o = adam_init(p)
    step = make_train_step(policy=BF16_COMPUTE, quantized=quantized)
    losses = []
    t0 = time.time()
    key = jax.random.key(11)
    for ep in range(EPOCHS):
        ek = jax.random.fold_in(key, ep)
        for batch in batch_iterator(train_ds, BATCH, key=ek):
            p, b, o, loss = step(p, b, o, batch["imgs"],
                                 step_decay(LR, ep))
        losses.append(float(loss))
        if ep % 20 == 0 or ep == EPOCHS - 1:
            print(f"[qtrain] {tag} ep{ep:03d} loss {losses[-1]:.4f} "
                  f"({(time.time() - t0) / 60:.1f} min)", flush=True)
    return p, b, losses


def main():
    level = sys.argv[1] if len(sys.argv) > 1 else "fwd+dx"
    key = jax.random.key(1981)
    train_ds, test_ds = simclutter_datasets(key, low_snr=5, high_snr=10,
                                            frames_per_level=FRAMES,
                                            crop=224)
    params0, bn0 = onet_init(jax.random.key(0), 1)
    print(f"[qtrain] level={level} {len(train_ds)} train frames", flush=True)

    p_e, b_e, l_e = train_one("exact", None, params0, bn0, train_ds)
    p_q, b_q, l_q = train_one(f"int8-{level}", level, params0, bn0,
                              train_ds)

    ev = make_eval_step(policy=BF16_COMPUTE, align="flip")
    ev_raw = make_eval_step(policy=BF16_COMPUTE, align="none")
    sums = {}
    agree_n = agree_d = 0
    for batch in batch_iterator(test_ds, BATCH):
        m_e, _, _ = ev(p_e, b_e, batch["imgs"], batch["labels"])
        m_q, _, _ = ev(p_q, b_q, batch["imgs"], batch["labels"])
        _, _, pr_e = ev_raw(p_e, b_e, batch["imgs"], batch["labels"])
        _, _, pr_q = ev_raw(p_q, b_q, batch["imgs"], batch["labels"])
        agree_n += int(jnp.sum(pr_e == pr_q))
        agree_d += pr_e.size
        for k in m_e:
            sums.setdefault("exact_" + k, []).append(float(m_e[k]))
            sums.setdefault("int8_" + k, []).append(float(m_q[k]))
    report = {
        "level": level,
        "epochs": EPOCHS,
        "mask_agreement": agree_n / agree_d,
        "final_loss": {"exact": l_e[-1], "int8": l_q[-1]},
        "metrics": {k: float(np.mean(v)) for k, v in sums.items()},
    }
    print(json.dumps(report, indent=1), flush=True)
    with open("runs/qtrain_report.json", "w") as f:
        json.dump(report, f, indent=1)
    ok = report["mask_agreement"] >= 0.99
    print(f"[qtrain] GATE {'PASS' if ok else 'FAIL'}: "
          f"agreement {report['mask_agreement']:.5f} (>= 0.99)", flush=True)


if __name__ == "__main__":
    main()
