"""Tabular result reports.

Reference equivalent: save_zy3_test_results_to_excel
(uti_zy3_test_20240123.py:320-429) — per-image rows plus per-group
(normal / thin / snow cloud) means. openpyxl is not available in this
image, so reports are written as CSV via pandas with an .xlsx fallback
when an Excel writer engine exists; thumbnails are saved as a PNG grid
next to the table instead of embedded cells.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd


def per_image_table(ids: Sequence[str], per_img: Dict[str, np.ndarray]) -> pd.DataFrame:
    df = pd.DataFrame({"img_id": list(ids)})
    for k, v in per_img.items():
        df[k] = np.asarray(v)
    return df


def grouped_summary(df: pd.DataFrame,
                    groups: Dict[str, List[str]]) -> pd.DataFrame:
    """Mean metrics per divided-testset group (normal/thin/snow...)."""
    rows = []
    metric_cols = [c for c in df.columns if c != "img_id"]
    for name, ids in groups.items():
        sub = df[df["img_id"].isin(ids)]
        row = {"group": name, "n": len(sub)}
        row.update({c: float(sub[c].mean()) if len(sub) else float("nan")
                    for c in metric_cols})
        rows.append(row)
    row = {"group": "all", "n": len(df)}
    row.update({c: float(df[c].mean()) for c in metric_cols})
    rows.append(row)
    return pd.DataFrame(rows)


def save_report(out_path: str, df: pd.DataFrame,
                summary: Optional[pd.DataFrame] = None) -> str:
    """Write the report; .xlsx if an engine is available, else CSV."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if out_path.endswith(".xlsx"):
        try:
            with pd.ExcelWriter(out_path) as w:
                df.to_excel(w, sheet_name="all", index=False)
                if summary is not None:
                    summary.to_excel(w, sheet_name="summary", index=False)
            return out_path
        except (ImportError, ValueError):
            out_path = out_path[:-5] + ".csv"
    df.to_csv(out_path, index=False)
    if summary is not None:
        summary.to_csv(out_path[:-4] + "_summary.csv", index=False)
    return out_path


def sort_results(rows, key: str = "acc", ascending: bool = True):
    """Per-image result rows sorted by a metric (the reference's
    print_sorted_results ordering for worst-case inspection)."""
    return sorted(rows, key=lambda r: r.get(key, float("nan")),
                  reverse=not ascending)
