"""Chain tests for the one-command full-protocol reproduction.

`runs/reproduce_all.py` chains all 8 stages of the reference's published
recipe (Train_Onet_on_simclutter_20250407.py:609-687,
Train_Onet_on_zy3_20240606.py:385-458, exp_nau_rain_20240513.py,
test_pre_processing_on_zy3_testset_20240607.py). These tests drive the
REAL stage-chaining code at the CPU-feasible `micro` scale (base-8 model,
32-px frames) so a chaining bug cannot hide until hours into a
paper-scale run (round-4 verdict, missing item 1/2):

- test_reproduce_chain_micro: all 8 stages complete; REPRODUCE.md +
  reproduce.json carry every stage with synthetic-data comparability
  flags on the real-imagery rows.
- test_reproduce_real_data_rehearsal: plant reference-schema ZY-3 / NAU
  `.pt` dicts and raw scene files at the documented `datasets/` paths,
  re-run, and assert the same command consumed the planted files and
  flipped the comparability flags to reference-comparable (round-4
  verdict, task 7).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ("gen_data", "sim_low", "sim_high", "sweep", "two_stage",
          "nau", "zy3", "choose_preprocess")


def _run_micro(tmp_path, monkeypatch, out_name):
    from runs.reproduce_all import run

    monkeypatch.chdir(tmp_path)
    out = os.path.join(str(tmp_path), out_name)
    report = run("micro", out)
    with open(os.path.join(out, "reproduce.json")) as f:
        on_disk = json.load(f)
    with open(os.path.join(out, "REPRODUCE.md")) as f:
        md = f.read()
    return report, on_disk, md


@pytest.mark.slow
def test_reproduce_chain_micro(tmp_path, monkeypatch):
    report, on_disk, md = _run_micro(tmp_path, monkeypatch, "repro")

    assert set(on_disk["stages"]) == set(STAGES)
    for s in STAGES:
        assert on_disk["stages"][s]["seconds"] >= 0
        assert "anchor" in on_disk["stages"][s]

    # metric payloads exist and are finite
    for s in ("sim_low", "sim_high"):
        e = on_disk["stages"][s]["final_eval"]
        assert all(np.isfinite(v) for v in e.values())
    assert {"Onet", "CFAR", "InfoSeg", "IIC"} <= set(
        on_disk["stages"]["nau"]["methods"])
    c = on_disk["stages"]["choose_preprocess"]
    assert c["acc_before"] is not None and c["acc_after"] is not None
    assert c["miou_before"] is not None

    # no real data planted -> real-imagery rows flagged synthetic
    for s in ("nau", "zy3", "choose_preprocess"):
        assert on_disk["stages"][s]["comparability"] == "synthetic-data"
    assert "comparability" in md
    assert "synthetic-data" in md
    # every display row of the table is present
    for label in ("gen-data", "simclutter PSNR0-2", "simclutter PSNR5-10",
                  "per-PSNR verify", "two-stage", "NAU transfer",
                  "zy3 (1 epochs)", "preprocess selection"):
        assert label in md, label


@pytest.mark.slow
def test_reproduce_real_data_rehearsal(tmp_path, monkeypatch):
    import jax

    from onet_tpu.data.export import export_nau_pt, export_zy3_pt
    from onet_tpu.data.nau import synthesize_nau_rain
    from onet_tpu.data.zy3 import synthesize_zy3
    from runs.onramp_scenes import write_scenes

    # Plant reference-schema files at the documented datasets/ paths.
    ds_dir = tmp_path / "datasets"
    ds_dir.mkdir()
    zy_tr, _ = synthesize_zy3(jax.random.key(10), n=6, size=32)
    zy_te, _ = synthesize_zy3(jax.random.key(11), n=6, size=32)
    export_zy3_pt(str(ds_dir / "zy3_train.pt"), zy_tr)
    export_zy3_pt(str(ds_dir / "zy3_test.pt"), zy_te)
    nau_ds, nau_ids = synthesize_nau_rain(jax.random.key(12), n=6, size=48)
    export_nau_pt(
        str(ds_dir / "naurain_20200819144753_10_target_img_label_dict.pt"),
        nau_ds, nau_ids)
    sc, _ = synthesize_zy3(jax.random.key(13), n=3, size=48)
    ids = [f"{1710000100 + i}" for i in range(3)]
    write_scenes(str(ds_dir / "zy3_scenes" / "src"),
                 str(ds_dir / "zy3_scenes" / "masks"),
                 np.asarray(sc["imgs"]), np.asarray(sc["labels"]), ids)

    report, on_disk, md = _run_micro(tmp_path, monkeypatch, "repro_real")

    st = on_disk["stages"]
    assert st["zy3"]["comparability"].startswith("reference-comparable")
    assert st["zy3"]["data"].endswith("zy3_train.pt")
    assert st["nau"]["comparability"].startswith("reference-comparable")
    assert st["nau"]["data"].endswith(".pt")
    cp = st["choose_preprocess"]
    assert cp["comparability"].startswith("reference-comparable")
    assert "zy3_scenes" in cp["data"]
    assert "synthetic-data" not in md
    assert "reference-comparable" in md
