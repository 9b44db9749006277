"""Synthesize raw ZY-3-like scenes for the on-ramp workload drive.

Stand-in for the raw JPG imagery the reference's thumbnail builder
consumes (test_pre_processing_on_zy3_testset_20240607.py:99-184): cloudy
RGB terrain scenes at 384x384 (larger than the 300/224 thumbnail sizes so
Resize/CenterCrop do real work), half of them degraded with a synthetic
airlight haze layer (I*t + A*(1-t)) so the dehaze-family preprocessing
options have signal to recover. Writes scene_<id>.jpg + label_<id>.png
pairs in the reference's filename-id convention.

Usage: python runs/onramp_scenes.py OUT_DIR [--n-train 40] [--n-test 12]
"""

import argparse
import os

import numpy as np

import jax


def write_scenes(src_dir, mask_dir, imgs, masks, ids, haze_every=2):
    from PIL import Image

    rng = np.random.default_rng(11)
    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for i, (img, mask, pid) in enumerate(zip(imgs, masks, ids)):
        img = np.asarray(img, np.float32)
        if i % haze_every == 1:  # haze half the scenes
            t = float(rng.uniform(0.5, 0.75))
            img = img * t + 0.92 * (1.0 - t)
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(src_dir, f"scene_{pid}.jpg"),
                                 quality=95)
        m8 = (np.asarray(mask) > 0.5).astype(np.uint8) * 255
        Image.fromarray(m8).save(os.path.join(mask_dir, f"label_{pid}.png"))


def main():
    jax.config.update("jax_platforms", "cpu")  # tiny job; keep the TPU free
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-train", type=int, default=40)
    ap.add_argument("--n-test", type=int, default=12)
    ap.add_argument("--size", type=int, default=384)
    args = ap.parse_args()

    from onet_tpu.data.zy3 import synthesize_zy3

    ds_tr, _ = synthesize_zy3(jax.random.key(2026), n=args.n_train,
                              size=args.size)
    ds_te, _ = synthesize_zy3(jax.random.key(4102), n=args.n_test,
                              size=args.size)
    tr_ids = [f"{1700000000 + i}" for i in range(args.n_train)]
    te_ids = [f"{1710000000 + i}" for i in range(args.n_test)]
    write_scenes(os.path.join(args.out_dir, "train", "src"),
                 os.path.join(args.out_dir, "train", "masks"),
                 np.asarray(ds_tr["imgs"]), np.asarray(ds_tr["labels"]),
                 tr_ids)
    write_scenes(os.path.join(args.out_dir, "test", "src"),
                 os.path.join(args.out_dir, "test", "masks"),
                 np.asarray(ds_te["imgs"]), np.asarray(ds_te["labels"]),
                 te_ids)
    print(f"[onramp-scenes] {args.n_train} train + {args.n_test} test "
          f"scenes at {args.size}^2 -> {args.out_dir}")


if __name__ == "__main__":
    main()
