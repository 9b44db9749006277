"""Full-size int8-serving gate on a trained checkpoint (real TPU):
mask agreement vs the bf16 folded graph on held-out frames + throughput.

Run: PYTHONPATH=. python runs/quant_validate.py [ckpt.npz]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from onet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import load_checkpoint
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init
from onet_tpu.models.quant import calibrate, quantize_folded, onet_infer_q
from onet_tpu.data.simclutter import simclutter_datasets
from onet_tpu.metrics.segmentation import (
    align_labels_by_accuracy, evaluate_binary_segmentation)

TILE_BENCH = 512
BATCH_BENCH = 32
ITERS = 10


def main():
    cks = sys.argv[1:] or sorted(glob.glob("runs/simclutter_high/*.npz"))
    assert cks, "no checkpoint found"
    params, bn = onet_init(jax.random.key(0), 1)
    params, bn, _ = load_checkpoint(cks[-1], params, bn)
    folded = jax.jit(fold_onet)(params, bn)

    # data: held-out simclutter frames at the training distribution
    key = jax.random.key(99)
    train_ds, test_ds = simclutter_datasets(key, low_snr=5, high_snr=10,
                                            frames_per_level=20)
    calib_x = train_ds["imgs"][:16]
    xs = test_ds["imgs"]
    labels = test_ds["labels"]

    scales = calibrate(folded, calib_x)
    q = quantize_folded(folded, scales)

    infer_bf = jax.jit(lambda f, xb: onet_infer(f, xb, policy=BF16_COMPUTE))
    infer_q = jax.jit(onet_infer_q)
    infer_q_full = jax.jit(lambda qq, xb: onet_infer_q(qq, xb,
                                                       head_bf16=False))

    agree_n, agree_full_n, tot = 0.0, 0.0, 0
    m_bf_sum, m_q_sum, nb = None, None, 0
    bs = min(20, int(xs.shape[0]))
    for i in range(0, xs.shape[0] - bs + 1, bs):
        xb, lb = xs[i:i + bs], labels[i:i + bs]
        _, lab_bf = infer_bf(folded, xb)
        _, lab_q = infer_q(q, xb)
        _, lab_qf = infer_q_full(q, xb)
        agree_n += float(jnp.sum((lab_bf == lab_q).astype(jnp.float32)))
        agree_full_n += float(jnp.sum((lab_bf == lab_qf).astype(jnp.float32)))
        tot += lab_bf.size
        pb = align_labels_by_accuracy(lab_bf, lb)
        pq = align_labels_by_accuracy(lab_q, lb)
        mb = {k: float(v) for k, v in
              evaluate_binary_segmentation(pb, lb).items()}
        mq = {k: float(v) for k, v in
              evaluate_binary_segmentation(pq, lb).items()}
        m_bf_sum = mb if m_bf_sum is None else {k: m_bf_sum[k] + mb[k]
                                                for k in mb}
        m_q_sum = mq if m_q_sum is None else {k: m_q_sum[k] + mq[k]
                                              for k in mq}
        nb += 1
    agreement = agree_n / tot
    agreement_full = agree_full_n / tot
    m_bf = {k: v / nb for k, v in m_bf_sum.items()}
    m_q = {k: v / nb for k, v in m_q_sum.items()}

    # throughput at the bench shape
    xb = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (BATCH_BENCH, TILE_BENCH, TILE_BENCH, 1)).astype(np.float32))
    rates = {}
    for name, fn, arg in (("bf16", infer_bf, folded), ("int8", infer_q, q),
                          ("int8_full", infer_q_full, q)):
        _, lab = fn(arg, xb)
        float(lab.sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0
            for _ in range(ITERS):
                acc = acc + fn(arg, xb)[1].sum()
            float(acc)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        rates[name] = BATCH_BENCH / best
    rec = {"checkpoint": cks[-1], "mask_agreement_vs_bf16": agreement,
           "mask_agreement_vs_bf16_fullint8": agreement_full,
           "metrics_bf16": m_bf, "metrics_int8": m_q,
           "infer_tiles_per_s": {k: round(v, 1) for k, v in rates.items()}}
    print(json.dumps(rec, indent=1))
    with open("runs/quant_report.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
