"""Curation & oracle-preprocessing workflows on synthetic data."""

import numpy as np
import pytest

import jax

from onet_tpu.data.zy3 import synthesize_zy3
from onet_tpu.models.onet import onet_init
from onet_tpu.preprocess.curation import (
    segment_trainset_report, divide_by_id_lists, load_division_table,
    choose_best_preprocess, classified_preprocess, make_thumbnail_mask,
)


@pytest.fixture(scope="module")
def setup():
    ds, ids = synthesize_zy3(jax.random.key(0), n=6, size=64)
    params, bn = onet_init(jax.random.key(1), 3, base=8)
    return ds, ids, params, bn


def test_segment_trainset_report(setup):
    ds, ids, params, bn = setup
    rows = segment_trainset_report(params, bn, ds, ids, batch_sz=3)
    assert len(rows) == 6
    assert all(0 <= r["fg_coverage"] <= 0.5 for r in rows)


def test_divide_by_id_lists_and_table(setup, tmp_path):
    import pandas as pd
    ds, ids, _, _ = setup
    table = tmp_path / "division.csv"
    pd.DataFrame({"group": ["a", "a", "b"],
                  "img_id": [ids[0], ids[2], ids[4]]}).to_csv(table, index=False)
    groups = load_division_table(str(table))
    assert groups == {"a": [ids[0], ids[2]], "b": [ids[4]]}
    sub, sub_ids = divide_by_id_lists(ds, ids, groups["a"])
    assert len(sub) == 2 and sub_ids == [ids[0], ids[2]]


def test_choose_best_preprocess_oracle(setup, rng):
    ds, ids, params, bn = setup
    u8s = [(np.asarray(ds["imgs"][i]) * 255).astype(np.uint8) for i in range(2)]
    labs = [np.asarray(ds["labels"][i]) for i in range(2)]
    best, rows = choose_best_preprocess(params, bn, u8s, labs, ids[:2],
                                        options=("raw_rgb", "histeq_rgb"))
    assert set(best) == set(ids[:2])
    assert len(rows) == 4
    for name in ids[:2]:
        per_img = [r["miou"] for r in rows if r["img_id"] == name]
        assert best[name]["miou"] == max(per_img)


def test_classified_preprocess(setup):
    ds, ids, _, _ = setup
    u8s = [(np.asarray(ds["imgs"][i]) * 255).astype(np.uint8) for i in range(2)]
    groups = {"snow_cloud": [ids[0]], "normal_cloud": [ids[1]]}
    out = classified_preprocess(u8s, ids[:2], groups)
    assert set(out) == set(ids[:2])
    assert out[ids[0]].shape == (64, 64, 3)


def test_make_thumbnail_mask(rng):
    m = (rng.random((300, 320)) > 0.5).astype(np.float32)
    t = make_thumbnail_mask(m, "xyz", resize_to=256, crop=224)
    assert t.shape == (224, 224) and set(np.unique(t)) <= {0.0, 1.0}
    t2 = make_thumbnail_mask(m, "1706158599", resize_to=256, crop=224)
    assert t2.min() == 1.0  # the reference's all-ones hack for this id
