"""Dataset curation & per-image preprocessing selection workflows.

Reference counterparts:
* ``segment_trainset_report`` — seg_on_zy3_trainset
  (select_trainset_for_correct_clouds_20240307.py:57-92): run the model
  over the trainset, record per-image foreground coverage for manual
  division;
* ``divide_by_id_lists`` — divide_zy3_traindata / get_divided_test_list
  (:122-144, uti_zy3_test_20240123.py:304-318): filter a dataset by
  id-group tables. The reference reads xlsx sheets; we accept
  {group: [ids]} dicts loaded from CSV (report/tables.py writes them) or
  xlsx when pandas has an engine;
* ``choose_best_preprocess`` — choose_test_preprocess
  (test_pre_processing_on_zy3_testset_20240607.py:359-472): for each test
  image try all 9 preprocessing options and keep the best-mIoU variant.
  NOTE this selection uses ground truth (oracle evaluation protocol, not
  inference) — preserved faithfully and flagged in the docstring as the
  reference does in its paper protocol;
* ``classified_preprocess`` — fixed option per cloud class (:261-357).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from onet_tpu.data.arrays import ArrayDataset
from onet_tpu.metrics.segmentation import accuracy, miou
from onet_tpu.models.onet import onet_forward, predict_label
from onet_tpu.preprocess.image import PRE_OPTIONS, apply_pre_option

CLASSIFIED_OPTIONS = {
    # classified_preprocess's fixed assignment (:261-357)
    "normal_cloud": "haze_enhance",
    "thin_cloud": "haze_enhance",
    "snow_cloud": "contrast_enhance_haze_remove",
}


def segment_trainset_report(params, bn_state, ds: ArrayDataset,
                            ids: Sequence[str], batch_sz: int = 5):
    """[{img_id, fg_coverage}] rows for manual trainset division."""
    rows = []
    n = len(ds)
    for lo in range(0, n, batch_sz):
        idx = jnp.arange(lo, min(lo + batch_sz, n))
        x = ds["imgs"][idx]
        out, _ = onet_forward(params, bn_state, x, train=False)
        pred = np.asarray(predict_label(out.S))
        for j, i in enumerate(range(lo, min(lo + batch_sz, n))):
            cov = float(pred[j].mean())
            cov = min(cov, 1 - cov)  # coverage of the minority channel
            rows.append({"img_id": ids[i], "fg_coverage": cov})
    return rows


def divide_by_id_lists(ds: ArrayDataset, ids: Sequence[str],
                       keep_ids: Sequence[str]):
    """Subset a dataset to the ids in ``keep_ids`` (order of ``ids``)."""
    keep = [i for i, name in enumerate(ids) if name in set(keep_ids)]
    sub = ds.select(jnp.asarray(np.asarray(keep, np.int32)))
    return sub, [ids[i] for i in keep]


def load_division_table(path: str, group_col: str = "group",
                        id_col: str = "img_id") -> Dict[str, List[str]]:
    """Read a division table (CSV, or xlsx sheets named per group)."""
    import pandas as pd

    if path.endswith(".xlsx"):
        sheets = pd.read_excel(path, sheet_name=None)
        return {name: df[id_col].astype(str).tolist()
                for name, df in sheets.items()}
    df = pd.read_csv(path)
    return {g: sub[id_col].astype(str).tolist()
            for g, sub in df.groupby(group_col)}


def _single_image_scores(params, bn_state, img_f32: np.ndarray,
                         label: np.ndarray) -> Tuple[float, float]:
    x = jnp.asarray(img_f32)[None]
    out, _ = onet_forward(params, bn_state, x, train=False)
    pred = predict_label(out.S)[0]
    lab = jnp.asarray(label)
    # the reference scores the RAW argmax here (:233-234), no reorder
    return float(accuracy(pred, lab)), float(miou(pred, lab))


def choose_best_preprocess(params, bn_state, u8_images: Sequence[np.ndarray],
                           labels: Sequence[np.ndarray],
                           ids: Sequence[str],
                           options: Sequence[str] = PRE_OPTIONS):
    """ORACLE protocol: per image, keep the option with the best mIoU
    against ground truth. Returns (best dict {id: {img, option, acc, miou}},
    table rows)."""
    best, rows = {}, []
    for u8, lab, name in zip(u8_images, labels, ids):
        entries = []
        for opt in options:
            img = apply_pre_option(u8, opt)
            acc, mi = _single_image_scores(params, bn_state, img, lab)
            entries.append((mi, acc, opt, img))
            rows.append({"img_id": name, "option": opt, "acc": acc, "miou": mi})
        entries.sort(key=lambda e: e[0], reverse=True)
        mi, acc, opt, img = entries[0]
        best[name] = {"img": img, "option": opt, "acc": acc, "miou": mi}
    return best, rows


def classified_preprocess(u8_images: Sequence[np.ndarray], ids: Sequence[str],
                          groups: Dict[str, List[str]],
                          assignment: Dict[str, str] = CLASSIFIED_OPTIONS):
    """Fixed per-class preprocessing (no oracle): returns {id: img}."""
    id_to_group = {}
    for g, id_list in groups.items():
        for i in id_list:
            id_to_group[i] = g
    out = {}
    for u8, name in zip(u8_images, ids):
        opt = assignment.get(id_to_group.get(name, ""), "raw_rgb")
        out[name] = apply_pre_option(u8, opt)
    return out


def make_thumbnail_mask(mask_img: np.ndarray, img_id: str = "",
                        *, resize_to: int = 300, crop: int = 224) -> np.ndarray:
    """Mask thumbnail: resize + center crop + >0.5 binarize; id
    '1706158599' is force-marked all-ones (reference hack,
    test_pre_processing...:186-212)."""
    from onet_tpu.preprocess.image import rgb_resize_smaller_edge, center_crop_hw

    m = mask_img
    if m.ndim == 2:
        m = m[..., None]
    m = rgb_resize_smaller_edge(m.astype(np.uint8) * 255
                                if m.max() <= 1 else m.astype(np.uint8),
                                resize_to)
    m = center_crop_hw(m, crop)[..., 0].astype(np.float32) / 255.0
    m = (m > 0.5).astype(np.float32)
    if img_id == "1706158599":
        m = np.ones_like(m)
    return m
