"""AOT serving artifacts (serve/artifact.py): export -> file -> load with
zero model code -> exact agreement with the live checkpoint serving path.

The reference has no serving/deployment surface (SURVEY.md L4: per-script
drivers only); this is the additive TPU-native deployment story, so the
tests pin its contracts: the single-file format, the symbolic batch
dimension, the shape/batch validation errors, and CLI round-trips through
`export-artifact` + `serve --model x.onetx` (detector included).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import DEFAULT
from onet_tpu.models.infer import fold_onet, onet_infer
from onet_tpu.models.onet import onet_init
from onet_tpu.serve.artifact import (
    export_serving_artifact, is_artifact, load_serving_artifact,
    read_artifact_meta)


@pytest.fixture(scope="module")
def small_model():
    return onet_init(jax.random.key(7), 1, base=8)


def _direct(params, bn, x):
    folded = jax.jit(fold_onet)(params, bn)
    s, labels = onet_infer(folded, jnp.asarray(x), policy=DEFAULT)
    return np.asarray(s), np.asarray(labels)


def test_symbolic_batch_roundtrip(small_model, tmp_path):
    params, bn = small_model
    path = str(tmp_path / "m.onetx")
    meta = export_serving_artifact(params, bn, path, input_hw=(32, 32),
                                   in_channels=1, batch=None, policy=DEFAULT,
                                   platforms=("cpu",))
    assert meta["batch"] == "symbolic"
    assert is_artifact(path) and not is_artifact(__file__)
    assert read_artifact_meta(path)["input_hw"] == [32, 32]

    call, _ = load_serving_artifact(path)
    rng = np.random.default_rng(0)
    for b in (1, 5):  # one artifact, multiple batch sizes
        x = rng.uniform(0, 1, (b, 32, 32, 1)).astype(np.float32)
        s, labels = call(x)
        s_ref, l_ref = _direct(params, bn, x)
        np.testing.assert_array_equal(np.asarray(labels), l_ref)
        np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-6)


def test_pinned_batch_and_shape_validation(small_model, tmp_path):
    params, bn = small_model
    path = str(tmp_path / "m4.onetx")
    export_serving_artifact(params, bn, path, input_hw=(32, 32),
                            in_channels=1, batch=4, policy=DEFAULT,
                            platforms=("cpu",))
    call, meta = load_serving_artifact(path)
    assert meta["batch"] == 4
    x = np.zeros((4, 32, 32, 1), np.float32)
    s, labels = call(x)
    assert np.asarray(labels).shape == (4, 32, 32)
    with pytest.raises(ValueError, match="pinned batch"):
        call(np.zeros((3, 32, 32, 1), np.float32))
    with pytest.raises(ValueError, match="static H/W/C"):
        call(np.zeros((4, 64, 64, 1), np.float32))


def test_int8_artifact_matches_live_quant_path(small_model, tmp_path):
    """An --int8 artifact bakes the SAME quantized graph the live
    `serve --int8` path builds: same calibration batch -> identical
    masks, and the header records the arithmetic."""
    from onet_tpu.models.quant import calibrate, onet_infer_q, quantize_folded

    params, bn = small_model
    rng = np.random.default_rng(3)
    calib = rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
    path = str(tmp_path / "q.onetx")
    meta = export_serving_artifact(params, bn, path, input_hw=(32, 32),
                                   in_channels=1, batch=None, policy=DEFAULT,
                                   platforms=("cpu",), int8_calib=calib)
    assert meta["arithmetic"] == "int8+bf16head"
    call, _ = load_serving_artifact(path)

    folded = jax.jit(fold_onet)(params, bn)
    scales = calibrate(folded, jnp.asarray(calib), policy=DEFAULT)
    q = quantize_folded(folded, scales)
    x = rng.uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)
    s_ref, l_ref = onet_infer_q(q, jnp.asarray(x))
    s, labels = call(x)
    # the artifact is compiled from the serialized module, not the live
    # trace; the bf16 head conv reassociates differently, so near-tie
    # pixels (random-init model: S ~ 0.5 everywhere) may flip. Hold the
    # int8 serving agreement contract (>= 99%) and score closeness.
    agree = float((np.asarray(labels) == np.asarray(l_ref)).mean())
    assert agree >= 0.99, agree
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=5e-2)


def test_int8_artifact_rejects_twin_model(tmp_path):
    from onet_tpu.models.onet import onet_init as init
    params, bn = init(jax.random.key(1), 1, base=8, weight_share=False)
    with pytest.raises(ValueError, match="weight-shared"):
        export_serving_artifact(
            params, bn, str(tmp_path / "t.onetx"), input_hw=(32, 32),
            in_channels=1, policy=DEFAULT, platforms=("cpu",),
            int8_calib=np.zeros((2, 32, 32, 1), np.float32))


def test_cli_export_arch_artifact(tmp_path, capsys):
    """Non-vanilla backbone families export their plain forward: the
    artifact reproduces `serve` on the same swin checkpoint."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.swin import swin_onet_init

    params, state = swin_onet_init(jax.random.key(0), 1, window=2,
                                   embed_dim=12)
    ck = str(tmp_path / "swin_epoch_1.npz")
    save_checkpoint(ck, params, state, 1,
                    meta={"arch": "swin", "swin_window": 2,
                          "swin_embed": 12, "in_channels": 1,
                          "weight_share": True})
    cli.main(["export-artifact", "--model", ck, "--input-sz", "64",
              "--platforms", "cpu", "--fp32"])
    out = capsys.readouterr().out
    assert "arch swin" in out
    art = str(tmp_path / "swin_epoch_1.onetx")
    assert read_artifact_meta(art)["arch"] == "swin"

    imgs = np.random.default_rng(0).uniform(
        0, 1, (4, 64, 64, 1)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    for tag, model in (("ck", ck), ("art", art)):
        cli.main(["serve", "--model", model, "--input",
                  str(tmp_path / "frames.npz"),
                  "--out", str(tmp_path / f"sw_{tag}.npz"),
                  "--fp32", "--serve-batch", "2"])
    np.testing.assert_array_equal(
        np.load(tmp_path / "sw_ck.npz")["masks"],
        np.load(tmp_path / "sw_art.npz")["masks"])

    with pytest.raises(SystemExit, match="arch swin"):
        cli.main(["export-artifact", "--model", ck, "--int8", "--fp32"])


def test_cli_serve_http_on_artifact(small_model, tmp_path, monkeypatch):
    """The resident HTTP daemon composes on the artifact step: start
    `serve --model x.onetx --http 0`, answer real requests, and match
    the direct artifact call."""
    import io
    import threading
    import time
    import urllib.request

    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    import onet_tpu.serve.http as H

    params, bn = small_model
    ck = str(tmp_path / "m_epoch_2.npz")
    save_checkpoint(ck, params, bn, 2)
    cli.main(["export-artifact", "--model", ck, "--input-sz", "32",
              "--platforms", "cpu", "--fp32"])
    art = str(tmp_path / "m_epoch_2.onetx")
    imgs = np.random.default_rng(5).uniform(
        0, 1, (4, 32, 32, 1)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)

    captured = {}
    real_start = H.start_server

    def capture(sess, port, host="127.0.0.1"):
        httpd = real_start(sess, port, host)
        captured["port"] = httpd.server_address[1]
        return httpd

    monkeypatch.setattr(H, "start_server", capture)
    t = threading.Thread(target=cli.main, args=(
        ["serve", "--model", art, "--input", str(tmp_path / "frames.npz"),
         "--fp32", "--serve-batch", "2", "--http", "0",
         "--http-requests", "2"],))
    t.start()
    try:
        deadline = time.time() + 120
        while "port" not in captured and time.time() < deadline:
            time.sleep(0.05)
        assert "port" in captured, "daemon never bound"
        base = f"http://127.0.0.1:{captured['port']}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["mode"].startswith("artifact:")
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(base + "/segment",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            masks = np.load(io.BytesIO(resp.read()))
    finally:
        t.join(timeout=120)
    assert not t.is_alive()
    call, _ = load_serving_artifact(art)
    _, direct = call(imgs)
    np.testing.assert_array_equal(masks,
                                  np.asarray(direct).astype(np.uint8))


def test_not_an_artifact_error(tmp_path):
    bad = tmp_path / "bad.onetx"
    bad.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="not a serving artifact"):
        read_artifact_meta(str(bad))


def test_cli_serve_pinned_batch_artifact_ragged_tail(small_model, tmp_path):
    """The flat serve loop pads the ragged final batch to the one
    compiled shape, so a pinned-batch artifact serves any frame count."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = small_model
    ck = str(tmp_path / "m_epoch_2.npz")
    save_checkpoint(ck, params, bn, 2)
    cli.main(["export-artifact", "--model", ck, "--input-sz", "32",
              "--platforms", "cpu", "--fp32", "--serve-batch", "4"])
    art = str(tmp_path / "m_epoch_2.onetx")
    imgs = np.random.default_rng(9).uniform(
        0, 1, (6, 32, 32, 1)).astype(np.float32)   # 6 = 4 + ragged 2
    np.savez(tmp_path / "frames.npz", imgs=imgs)
    cli.main(["serve", "--model", art, "--input",
              str(tmp_path / "frames.npz"),
              "--out", str(tmp_path / "rag.npz"),
              "--fp32", "--serve-batch", "4"])
    masks = np.load(tmp_path / "rag.npz")["masks"]
    assert masks.shape == (6, 32, 32)
    call, _ = load_serving_artifact(art)
    _, direct = call(np.concatenate([imgs[4:], imgs[4:]]))  # pad as CLI does
    np.testing.assert_array_equal(masks[4:], np.asarray(direct)[:2]
                                  .astype(np.uint8))


def test_cli_serve_artifact_input_errors(small_model, tmp_path):
    """Missing --input paths and shape-mismatched synthetic fallbacks
    fail loudly instead of silently serving the wrong data."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = small_model
    ck = str(tmp_path / "m_epoch_2.npz")
    save_checkpoint(ck, params, bn, 2)
    cli.main(["export-artifact", "--model", ck, "--input-sz", "32",
              "--platforms", "cpu", "--fp32"])
    art = str(tmp_path / "m_epoch_2.onetx")
    with pytest.raises(SystemExit, match="no such file"):
        cli.main(["serve", "--model", art, "--input",
                  str(tmp_path / "typo.npz"), "--fp32"])
    # a 32^2 artifact cannot use the 224^2 synthetic fallback
    with pytest.raises(SystemExit, match="pass --input"):
        cli.main(["serve", "--model", art, "--fp32"])


def test_corrupted_artifact_fails_checksum(small_model, tmp_path):
    params, bn = small_model
    path = str(tmp_path / "c.onetx")
    export_serving_artifact(params, bn, path, input_hw=(32, 32),
                            in_channels=1, policy=DEFAULT,
                            platforms=("cpu",))
    data = bytearray(open(path, "rb").read())
    data[-100] ^= 0xFF                      # flip a byte in the module
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        load_serving_artifact(path)
    truncated = str(tmp_path / "t.onetx")
    open(truncated, "wb").write(bytes(data[:-1000]))
    with pytest.raises(ValueError, match="checksum"):
        load_serving_artifact(truncated)
    # every malformation class raises ValueError with a clear message,
    # never struct.error / JSONDecodeError
    clean = open(str(tmp_path / "c.onetx"), "rb").read()
    for cut, msg in ((12, "16-byte prefix"), (40, "truncated artifact "
                                                  "header")):
        p = str(tmp_path / f"cut{cut}.onetx")
        open(p, "wb").write(clean[:cut])
        with pytest.raises(ValueError, match=msg):
            read_artifact_meta(p)
    garbled = bytearray(clean)
    garbled[20] = 0xFF                      # inside the JSON header
    p = str(tmp_path / "gar.onetx")
    open(p, "wb").write(bytes(garbled))
    with pytest.raises(ValueError, match="corrupted artifact header"):
        read_artifact_meta(p)
    import json as _json
    import struct as _struct
    from onet_tpu.serve.artifact import MAGIC
    head = _json.dumps({"header_version": 99}).encode()
    p = str(tmp_path / "future.onetx")
    open(p, "wb").write(MAGIC + _struct.pack("<Q", len(head)) + head)
    with pytest.raises(ValueError, match="upgrade this package"):
        read_artifact_meta(p)


def test_cli_serve_tiled_on_artifact(small_model, tmp_path, capsys):
    """`serve --tile` composes with an artifact exported at the WINDOW
    size (tile + 2*halo): identical masks to checkpoint tiled serving."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = small_model
    ck = str(tmp_path / "m_epoch_2.npz")
    save_checkpoint(ck, params, bn, 2)
    cli.main(["export-artifact", "--model", ck, "--input-sz", "32",
              "--platforms", "cpu", "--fp32"])   # 32 = tile 16 + 2*8
    art = str(tmp_path / "m_epoch_2.onetx")

    scene = np.random.default_rng(2).uniform(
        0, 1, (1, 48, 48, 1)).astype(np.float32)
    np.savez(tmp_path / "scene.npz", imgs=scene)
    for tag, model in (("ck", ck), ("art", art)):
        cli.main(["serve", "--model", model, "--input",
                  str(tmp_path / "scene.npz"),
                  "--out", str(tmp_path / f"t_{tag}.npz"),
                  "--fp32", "--tile", "16", "--halo", "8",
                  "--serve-batch", "2"])
    np.testing.assert_array_equal(
        np.load(tmp_path / "t_ck.npz")["masks"],
        np.load(tmp_path / "t_art.npz")["masks"])


def test_cli_export_and_serve_artifact(small_model, tmp_path, capsys):
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint

    params, bn = small_model
    ck = str(tmp_path / "m_epoch_2.npz")
    save_checkpoint(ck, params, bn, 2)
    cli.main(["export-artifact", "--model", ck, "--input-sz", "32",
              "--platforms", "cpu", "--fp32"])
    art = str(tmp_path / "m_epoch_2.onetx")
    assert os.path.exists(art)
    assert "[export-artifact]" in capsys.readouterr().out

    imgs = np.random.default_rng(1).uniform(
        0, 1, (6, 32, 32, 1)).astype(np.float32)
    np.savez(tmp_path / "frames.npz", imgs=imgs)

    # artifact serving == checkpoint serving, mask for mask
    for tag, model in (("ck", ck), ("art", art)):
        cli.main(["serve", "--model", model, "--input",
                  str(tmp_path / "frames.npz"),
                  "--out", str(tmp_path / f"out_{tag}.npz"),
                  "--fp32", "--serve-batch", "3"])
    m_ck = np.load(tmp_path / "out_ck.npz")["masks"]
    m_art = np.load(tmp_path / "out_art.npz")["masks"]
    np.testing.assert_array_equal(m_ck, m_art)
    assert "[serve] artifact" in capsys.readouterr().out

    # the detector pipeline composes on top of the artifact step
    cli.main(["serve", "--model", art, "--input",
              str(tmp_path / "frames.npz"),
              "--out", str(tmp_path / "det.npz"),
              "--far-budget", "0.05", "--fp32", "--serve-batch", "6"])
    assert "calibrated detector threshold" in capsys.readouterr().out
    with np.load(tmp_path / "det.npz") as z:
        assert z["masks"].shape == (6, 32, 32)

    # int8 / dp are checkpoint-path features: clear errors on artifacts
    with pytest.raises(SystemExit, match="int8"):
        cli.main(["serve", "--model", art, "--int8", "--fp32",
                  "--input", str(tmp_path / "frames.npz")])
