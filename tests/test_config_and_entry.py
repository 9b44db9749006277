"""Config loading, log mining, and the multichip dryrun on the virtual mesh."""

import os

import numpy as np
import pytest

import jax

from onet_tpu.core.config import generate_config, config_to_str
from onet_tpu.report.logs import epoch_log_line, mine_epoch_metrics

YML = os.path.join(os.path.dirname(__file__), "..", "onet_tpu", "configs", "onet.yml")


def test_config_sections_load():
    for name, chn in (("zy3", 3), ("Rayleigh", 1), ("naurain", 1)):
        cfg = generate_config(YML, name, argv=[])
        assert cfg.input_chn == chn
        assert cfg.dataset == name
        assert "Config:" in config_to_str(cfg)


def test_cli_overrides_yaml():
    cfg = generate_config(YML, "Rayleigh", argv=["--enc_in_channels", "32"])
    assert cfg.enc_in_channels == 32


IIC_YML = """
iic:
  model_ind: 570
  mode: IID
  batch_sz: 60
  num_dataloaders: 3
  gt_k: 2
  output_k_A: 10
  output_k_B: 2
  num_epochs: 100
  lr_schedule: [40, 80]
  restart: false
  out_dir: "{out}"
"""


def test_iic_legacy_config(tmp_path):
    """Legacy IIC path: derived fields, restart via saved config
    (config_tip2022_20230411.py:46-100 semantics, JSON instead of pickle)."""
    from onet_tpu.core.config import save_config_iic
    yml = tmp_path / "train_iic.yml"
    yml.write_text(IIC_YML.format(out=tmp_path))
    cfg = generate_config(str(yml), "iic")
    assert cfg.dataloader_batch_sz == 20
    assert cfg.output_k == 2 and cfg.eval_mode == "hung"
    assert cfg.epoch_acc == [] and cfg.epoch_loss_head_B == []
    assert cfg.use_doersch_datasets is False

    cfg.epoch_acc.append(0.5)
    save_config_iic(cfg, str(tmp_path))

    # A restart run reloads the saved config but keeps the fresh
    # num_epochs / lr_schedule.
    yml2 = tmp_path / "train_iic2.yml"
    yml2.write_text(IIC_YML.format(out=tmp_path)
                    .replace("restart: false", "restart: true")
                    .replace("num_epochs: 100", "num_epochs: 200"))
    cfg2 = generate_config(str(yml2), "iic")
    assert cfg2.restart is True
    assert cfg2.epoch_acc == [0.5]          # state reloaded
    assert cfg2.num_epochs == 200           # fresh schedule wins
    assert cfg2.model_ind == 570


def test_log_line_roundtrip(tmp_path):
    metrics = {"acc": 0.9514, "miou": 0.81, "dr": 0.77, "far": 1.1e-3,
               "tiou": 0.5}
    line = epoch_log_line("onet_rayleigh", 42, -1.2345, 5e-6, metrics)
    p = tmp_path / "x.log"
    p.write_text("junk\n" + line + "\nmore junk\n")
    rows = mine_epoch_metrics(str(p))
    assert len(rows) == 1
    row = rows[0]
    assert row["epoch"] == 42
    np.testing.assert_allclose(row["loss"], -1.2345, atol=1e-4)
    np.testing.assert_allclose(row["acc"], 0.9514, atol=1e-4)
    np.testing.assert_allclose(row["far"], 1.1e-3, rtol=1e-2)


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip("needs virtual device mesh")
    import __graft_entry__ as g
    g.dryrun_multichip(n)


def test_log_mining_extras(tmp_path):
    from onet_tpu.report.logs import (dr_far_curve, average_pd_by_far_decade,
                                      format_latex_table)
    rows = [{"epoch": i, "loss": -1.0, "lr": 1e-5, "acc": 0.9, "miou": 0.8,
             "tiou": 0.5, "dr": 0.7 + 0.01 * i, "far": 10.0 ** (-i - 1)}
            for i in range(4)]
    drs, fars = dr_far_curve(rows)
    assert len(drs) == 4 and fars[0] == 0.1
    binned = average_pd_by_far_decade(rows)
    assert set(binned) == {-1, -2, -3, -4}
    tex = format_latex_table(rows)
    assert tex.count("\\\\") == 5 and "0.9000" in tex


def test_utils_summary():
    import jax as _jax
    from onet_tpu.models.onet import onet_init
    from onet_tpu.utils import (count_parameters, model_summary,
                                parameter_statistics, compare_parameter_trees)
    p, s = onet_init(_jax.random.key(0), 1, base=8)
    assert 0.1 < count_parameters(p) < 2.0
    rows = model_summary(p, input_hw=(64, 64), in_channels=1)
    assert rows[-1]["name"] == "TOTAL"
    assert rows[-1]["params"] == int(count_parameters(p) * 1e6)
    stats = parameter_statistics(p)
    assert all("mean" in v for v in stats.values())
    assert compare_parameter_trees(p, p) == []


def test_full_size_param_count_matches_reference():
    """The reference weight-shared Onet is ~31M params (SURVEY.md 2.1)."""
    import jax as _jax
    from onet_tpu.models.onet import onet_init
    from onet_tpu.utils import count_parameters
    p, _ = onet_init(_jax.random.key(0), 1)
    assert abs(count_parameters(p) - 31.04) < 0.1
