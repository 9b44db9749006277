"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Multi-chip sharding is validated on a virtual CPU mesh (real multi-chip
hardware is exercised by the driver's dryrun); numerics tests also run on
CPU for determinism and speed.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend via the
# config API as well (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(1981)


# The <5-min smoke tier (`pytest -m quick`): one representative per
# subsystem, maintained centrally here so individual files stay
# marker-free. Anything matching a prefix below gets the `quick` marker
# (nodeids, so both whole files and single tests can be listed).
QUICK_NODES = (
    "test_math_ops.py",            # ops: log1pexp/custom-VJP numerics
    "test_metrics.py",             # metrics bundle + Hungarian/reorders
    "test_layers_pool.py",         # model layers: pool/convT/BN
    "test_model_parity.py::test_eval_forward_parity",  # torch parity gate
    "test_simulators.py::test_rayleigh_frames_snr_calibration",  # sim
    "test_pt_ingestion.py",        # data: reference .pt round-trip
    "test_preprocess.py",          # preprocess: haze/cv2 parity
    "test_onramp.py::test_prepare_thumbnails",     # on-ramp
    "test_checkpoint_ft.py::test_optimizer_state_round_trip",  # ckpt
    "test_checkpoint_ft.py::test_rotation_keeps_newest",
    "test_config_and_entry.py::test_cli_overrides_yaml",       # config
    "test_config_and_entry.py::test_dryrun_multichip[4]",      # entry
    "test_report_xlsx.py",         # from-scratch OOXML writer
    "test_dp_equivalence.py::test_sharded_step_matches_single_device[False]",
    "test_spatial_halo.py::test_halo_conv_matches_same_padding",  # sp
    "test_quant.py::test_quant_mask_agreement",          # int8 PTQ
    "test_serve_http.py",          # serving daemon
    "test_profiling.py",           # profiling utils
    "test_verify_data.py",         # data conformance kit
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("tests/")[-1]
        if any(name == q or name.startswith(q + "::") or
               (q.endswith(".py") and name.startswith(q))
               for q in QUICK_NODES):
            item.add_marker(pytest.mark.quick)
