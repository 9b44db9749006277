"""Config system: YAML per-dataset sections + CLI overrides.

Schema parity with the reference (configs/config_tip2022_20230411.py:15-43,
configs/train_onet_20250407.yml): ``generate_config(yml, dataset_name)``
loads the named YAML section into a namespace; declared CLI flags override
YAML values; everything else passes through untouched so reference YAML
files load as-is. ``device`` is resolved from the JAX backend instead of
torch.cuda.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace
from typing import Optional, Sequence

import yaml

# The reference declares exactly these CLI flags (:25-29).
_CLI_FLAGS = (
    ("--enc_in_channels", int, "depth of channels in the first encoder layer"),
    ("--outc_channels", int, "depth of channels at the decoder end"),
    ("--layer_type", str, "type of layer"),
    ("--feature_src", str, "feature source: 'enc' or 'dec'"),
    ("--enc_depth", int, "number of encoder layers"),
)


def _device_name() -> str:
    try:
        import jax
        return jax.default_backend()
    except Exception:  # pragma: no cover - jax always importable here
        return "cpu"


def setup_config(conf_yml: str, dataset: str = "zy3",
                 argv: Optional[Sequence[str]] = None) -> SimpleNamespace:
    with open(conf_yml) as fp:
        section = yaml.safe_load(fp)[dataset]

    parser = argparse.ArgumentParser()
    for flag, typ, help_txt in _CLI_FLAGS:
        parser.add_argument(flag, type=typ, help=help_txt)
    ns = parser.parse_args([] if argv is None else list(argv))

    config = SimpleNamespace(**vars(ns))
    for key, val in section.items():
        if getattr(config, key, None) is not None:
            continue  # CLI wins over YAML
        setattr(config, key, val)
    config.device = _device_name()
    config.nocuda = config.device == "cpu"
    return config


def generate_config(yml_file: str, dataset_name: str,
                    argv: Optional[Sequence[str]] = None) -> SimpleNamespace:
    assert os.path.exists(yml_file), yml_file
    return setup_config(yml_file, dataset=dataset_name, argv=argv)


def config_to_str(config) -> str:
    attrs = vars(config)
    lines = "\n".join("%s: %s" % kv for kv in attrs.items())
    return "Config: -----\n" + lines + "\n----------"
