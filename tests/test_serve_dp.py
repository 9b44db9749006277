"""Data-parallel serving (serve --dp) on the virtual 8-device mesh.

The serving graph is per-frame, so data parallelism must (a) reproduce the
single-device masks bit-exactly, including ragged tails that pad to a
multiple of the mesh, and (b) introduce ZERO collectives into the compiled
program — sharding the batch axis of an embarrassingly-parallel graph is
free scaling, not a numerical change. (Additive surface; SURVEY §2.10.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from onet_tpu.core.checkpoint import save_checkpoint
from onet_tpu.core.mesh import batch_sharding, make_mesh, put_per_spec, replicated
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init

BASE = 8
HW = 32


def _frames(n, ch=1, seed=0):
    return np.random.default_rng(seed).uniform(
        0, 1, (n, HW, HW, ch)).astype(np.float32)


def _serve(tmp_path, ck, tag, extra):
    from onet_tpu import run as cli
    out = tmp_path / f"masks_{tag}.npz"
    cli.main(["serve", "--model", str(ck), "--input",
              str(tmp_path / "frames.npz"), "--out", str(out),
              "--base-channels", str(BASE), "--fp32",
              "--serve-batch", "4"] + extra)
    return np.load(out)["masks"]


def test_dp_serving_matches_single_device(tmp_path):
    params, bn = onet_init(jax.random.key(0), 1, base=BASE)
    ck = tmp_path / "m_epoch_1.npz"
    save_checkpoint(str(ck), params, bn, 1)
    # 6 frames / batch 4 -> one full batch + a ragged tail of 2 that the
    # dp path pads to 4 and crops back
    np.savez(tmp_path / "frames.npz", imgs=_frames(6))

    ref = _serve(tmp_path, ck, "single", [])
    for dp in (2, 4):
        got = _serve(tmp_path, ck, f"dp{dp}", ["--dp", str(dp)])
        np.testing.assert_array_equal(got, ref)


def test_dp_composes_with_detector(tmp_path):
    params, bn = onet_init(jax.random.key(1), 1, base=BASE)
    ck = tmp_path / "m_epoch_2.npz"
    save_checkpoint(str(ck), params, bn, 2)
    np.savez(tmp_path / "frames.npz", imgs=_frames(4, seed=3))

    ref = _serve(tmp_path, ck, "det", ["--far-budget", "0.05"])
    (tmp_path / "m_epoch_2.npz.detector.json").unlink()  # fresh calibration
    got = _serve(tmp_path, ck, "det_dp", ["--far-budget", "0.05",
                                          "--dp", "2"])
    np.testing.assert_array_equal(got, ref)


def test_dp_inference_graph_has_no_collectives():
    """shard_map dp serving must partition without communication: no
    all-reduce/all-gather/permute in the HLO. (Plain GSPMD batch-sharding
    of this graph inserts collective-permutes at the deep levels where the
    twin branches are batch-stacked — which is why serve --dp uses
    shard_map; this test pins that design.)"""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    params, bn = onet_init(jax.random.key(2), 1, base=BASE)
    folded = fold_onet(params, bn)
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    folded = put_per_spec(folded, replicated(mesh))
    x = jax.device_put(jnp.zeros((8, HW, HW, 1)), batch_sharding(mesh))
    fn = jax.jit(shard_map(onet_infer, mesh=mesh,
                           in_specs=(P(), P("data")), out_specs=P("data")))
    hlo = fn.lower(folded, x).compile().as_text()
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        assert op not in hlo, f"unexpected {op} in dp serving HLO"
