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
