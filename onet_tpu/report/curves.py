"""Training-curve and result-grid PNGs (host-side matplotlib).

Reference equivalents: the loss/metric curve figures
(Train_Onet_on_simclutter_20250407.py:269-284, Train_Onet_on_zy3_20240606
.py:155-167) and the X / pred_t / pred_d / label / pred grids
(utils_20231218.py:479-659, show_unet_adversarial_v2).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def save_training_curves(path: str, loss: List[float],
                         eval_history: Dict[int, Dict[str, float]]):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    axs[0].plot(loss, "r", label="train_loss")
    axs[0].legend()
    axs[0].set_xlabel("epoch")
    if eval_history:
        epochs = sorted(eval_history)
        styles = {"acc": "r", "miou": "g-.", "dr": "b--", "far": "k:",
                  "tiou": "m"}
        for key, style in styles.items():
            vals = [eval_history[e].get(key) for e in epochs]
            if all(v is not None for v in vals):
                axs[1].plot(epochs, vals, style, label=key)
        axs[1].legend()
        axs[1].set_xlabel("epoch")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def save_result_grid(path: str, x: np.ndarray, pred_t: np.ndarray,
                     pred_d: np.ndarray, label: np.ndarray,
                     pred: np.ndarray, title: str = "", max_cols: int = 5):
    """5-row grid: input / Vt / Vd / GT / prediction (the reference's
    show_unet_adversarial_v2 layout)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = min(max_cols, x.shape[0])
    rows = [("input", x), ("pred_t", pred_t), ("pred_d", pred_d),
            ("label", label), ("pred", pred)]
    fig, axs = plt.subplots(len(rows), n, figsize=(2 * n, 2 * len(rows)),
                            squeeze=False)
    for r, (name, arr) in enumerate(rows):
        for c in range(n):
            img = np.asarray(arr[c])
            if img.ndim == 3 and img.shape[-1] == 1:
                img = img[..., 0]
            axs[r][c].imshow(img, cmap=None if img.ndim == 3 else "viridis")
            axs[r][c].set_xticks([])
            axs[r][c].set_yticks([])
        axs[r][0].set_ylabel(name)
    if title:
        fig.suptitle(title, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path
