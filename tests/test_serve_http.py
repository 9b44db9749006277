"""HTTP serving daemon (serve/http.py): warm-graph residency, npy I/O.

The reference has no serving layer at all (SURVEY §1: "There is no
CLI/serving layer"); this is additive TPU-framework surface. Tests run
the real HTTP stack on an ephemeral localhost port with the tiny model.
"""

import io
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_session(batch=3, tile=0, halo=8):
    from onet_tpu.core.policy import DEFAULT
    from onet_tpu.models.infer import fold_onet, onet_infer
    from onet_tpu.models.onet import onet_init
    from onet_tpu.serve.http import ServingSession

    params, bn = onet_init(jax.random.key(4), 1, base=8)
    folded = jax.jit(fold_onet)(params, bn)
    step = jax.jit(lambda f, xb: onet_infer(f, xb, policy=DEFAULT))
    sess = ServingSession(step, folded, batch=batch, in_channels=1,
                          mode="fp32", model_name="tiny.npz",
                          tile=tile, halo=halo, input_hw=(32, 32))
    return sess, step, folded


def test_canonicalize_shapes():
    from onet_tpu.serve.http import canonicalize

    for shape in [(16, 16), (16, 16, 1), (2, 16, 16), (2, 16, 16, 1)]:
        out = canonicalize(np.zeros(shape, np.float32), 1)
        assert out.ndim == 4 and out.shape[-1] == 1
    rgb = canonicalize(np.zeros((16, 16, 3), np.float32), 3)
    assert rgb.shape == (1, 16, 16, 3)
    with pytest.raises(ValueError):
        canonicalize(np.zeros((2, 16, 16, 3), np.float32), 1)
    with pytest.raises(ValueError):
        canonicalize(np.zeros((2, 2, 2, 2, 2), np.float32), 1)


def test_segment_ragged_batch_matches_direct_step(rng):
    sess, step, folded = _tiny_session(batch=3)
    imgs = rng.uniform(0, 1, (5, 32, 32, 1)).astype(np.float32)
    masks, dev_ms = sess.segment(imgs)
    assert masks.shape == (5, 32, 32) and dev_ms > 0
    _, direct = step(folded, jnp.asarray(imgs))
    np.testing.assert_array_equal(masks, np.asarray(direct).astype(np.uint8))


def test_segment_scenes_matches_infer_tiled(rng):
    from onet_tpu.serve.tiles import infer_tiled

    sess, step, folded = _tiny_session(batch=2, tile=16, halo=8)
    scenes = rng.uniform(0, 1, (2, 40, 48, 1)).astype(np.float32)
    masks, _ = sess.segment_scenes(scenes)
    assert masks.shape == (2, 40, 48)
    ref = infer_tiled(step, folded, scenes[0], tile=16, halo=8, batch=2)
    np.testing.assert_array_equal(masks[0], ref.astype(np.uint8))


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        body = resp.read()
        return np.load(io.BytesIO(body)), dict(resp.headers)


def _get_json(url):
    import json
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def test_http_end_to_end(rng):
    """Real HTTP stack: health -> segment (ragged, + normalize) -> stats."""
    from onet_tpu.ops.normalize import minmax_per_frame
    from onet_tpu.serve.http import start_server

    sess, step, folded = _tiny_session(batch=3)
    sess.warmup()
    httpd = start_server(sess, 0)
    port = httpd.server_address[1]
    n_requests = 5
    t = threading.Thread(
        target=lambda: [httpd.handle_request() for _ in range(n_requests)])
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = _get_json(base + "/healthz")
        assert health["status"] == "ok" and health["batch"] == 3

        imgs = rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
        masks, headers = _post_npy(base + "/segment", imgs)
        assert masks.shape == (4, 32, 32) and masks.dtype == np.uint8
        assert headers["X-Onet-Frames"] == "4"
        _, direct = step(folded, jnp.asarray(imgs))
        np.testing.assert_array_equal(masks,
                                      np.asarray(direct).astype(np.uint8))

        # ?normalize=1 applies the reference's per-frame min-max first
        raw = (imgs * 37.0 + 5.0).astype(np.float32)   # arbitrary range
        masks_n, _ = _post_npy(base + "/segment?normalize=1", raw)
        _, direct_n = step(folded, minmax_per_frame(jnp.asarray(raw)))
        np.testing.assert_array_equal(masks_n,
                                      np.asarray(direct_n).astype(np.uint8))

        # a bad payload surfaces as a 400, not a dead server
        req = urllib.request.Request(base + "/segment", data=b"not npy",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

        stats = _get_json(base + "/stats")
        assert stats["requests"] == 2 and stats["frames"] == 8
        assert stats["errors"] == 1
        assert stats["device_ms"]["p50"] > 0
    finally:
        t.join(timeout=60)
        httpd.server_close()
    assert not t.is_alive()


def test_http_concurrent_load(rng):
    """Daemon under contention: N segment clients + health/stat probes.

    The daemon serializes device steps behind a lock (one chip, one
    graph) while the HTTP layer is threaded so probes never queue behind
    inference (serve/http.py docstring). This drives that contract:
      * every concurrent /segment response is mask-exact vs the direct
        jitted step on the same payload (the lock never mixes requests),
      * /healthz and /stats stay responsive while inference is queued,
      * counters are consistent (requests/frames/errors) and the latency
        percentiles are finite and sane,
      * concurrent malformed payloads 400 without wedging the server.
    """
    import json
    import urllib.error

    from onet_tpu.serve.http import start_server

    n_clients, n_reqs = 6, 4
    sess, step, folded = _tiny_session(batch=2)
    sess.warmup()
    httpd = start_server(sess, 0)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    server = threading.Thread(target=httpd.serve_forever,
                              kwargs={"poll_interval": 0.05})
    server.start()

    # Pre-generate payloads + expected masks so worker threads only do I/O.
    payloads, expected = [], []
    for c in range(n_clients):
        batch = [rng.uniform(0, 1, (1 + (c + r) % 3, 32, 32, 1))
                 .astype(np.float32) for r in range(n_reqs)]
        payloads.append(batch)
        expected.append([np.asarray(step(folded, jnp.asarray(b))[1])
                         .astype(np.uint8) for b in batch])

    errors: list = []
    probe_lat_ms: list = []
    stop_probes = threading.Event()

    def segment_client(cid):
        try:
            for r in range(n_reqs):
                masks, headers = _post_npy(base + "/segment",
                                           payloads[cid][r])
                np.testing.assert_array_equal(masks, expected[cid][r])
                assert headers["X-Onet-Frames"] == str(masks.shape[0])
        except Exception as e:  # noqa: BLE001 — surfaced after join
            errors.append(f"client {cid}: {e!r}")

    def bad_client():
        try:
            for _ in range(2):
                req = urllib.request.Request(base + "/segment",
                                             data=b"junk", method="POST")
                try:
                    urllib.request.urlopen(req, timeout=30)
                    errors.append("bad payload did not 400")
                except urllib.error.HTTPError as e:
                    assert e.code == 400
                    json.loads(e.read())   # body is well-formed JSON
        except Exception as e:  # noqa: BLE001
            errors.append(f"bad_client: {e!r}")

    def probe_client(path):
        try:
            while not stop_probes.is_set():
                t0 = time.perf_counter()
                obj = _get_json(base + path)
                probe_lat_ms.append((time.perf_counter() - t0) * 1e3)
                assert "error" not in obj
                time.sleep(0.01)
        except Exception as e:  # noqa: BLE001
            errors.append(f"probe {path}: {e!r}")

    threads = ([threading.Thread(target=segment_client, args=(c,))
                for c in range(n_clients)]
               + [threading.Thread(target=bad_client)]
               + [threading.Thread(target=probe_client, args=(p,))
                  for p in ("/healthz", "/stats")])
    try:
        for t in threads:
            t.start()
        for t in threads[:n_clients + 1]:
            t.join(timeout=300)
        stop_probes.set()
        for t in threads[n_clients + 1:]:
            t.join(timeout=60)
        assert not any(t.is_alive() for t in threads), "request deadlock"
        assert not errors, errors

        stats = _get_json(base + "/stats")
        assert stats["requests"] == n_clients * n_reqs
        assert stats["frames"] == sum(
            b.shape[0] for batch in payloads for b in batch)
        assert stats["errors"] == 2
        # Percentiles exist and are sane under contention (generous bound:
        # this guards against deadlock/shutdown-hang regressions, not
        # absolute speed on a shared CPU host).
        for key in ("device_ms", "total_ms"):
            assert 0 < stats[key]["p95"] < 60_000
        assert probe_lat_ms and max(probe_lat_ms) < 30_000, \
            "health/stat probes starved behind inference"
    finally:
        stop_probes.set()
        httpd.shutdown()
        server.join(timeout=60)
        httpd.server_close()
    assert not server.is_alive()


def test_cli_serve_http(tmp_path, capsys, monkeypatch):
    """`run serve --http 0 --http-requests N` end to end through the CLI."""
    from onet_tpu import run as cli
    from onet_tpu.core.checkpoint import save_checkpoint
    from onet_tpu.models.onet import onet_init
    import onet_tpu.serve.http as H

    params, bn = onet_init(jax.random.key(4), 1, base=8)
    ck = tmp_path / "m_epoch_3.npz"
    save_checkpoint(str(ck), params, bn, 3)
    imgs = np.random.default_rng(0).uniform(
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
        ["serve", "--model", str(ck), "--input",
         str(tmp_path / "frames.npz"), "--base-channels", "8", "--fp32",
         "--serve-batch", "2", "--http", "0", "--http-requests", "2"],))
    t.start()
    try:
        deadline = time.time() + 120
        while "port" not in captured and time.time() < deadline:
            time.sleep(0.05)
        assert "port" in captured, "daemon never bound"
        base = f"http://127.0.0.1:{captured['port']}"
        health = _get_json(base + "/healthz")
        assert health["mode"] == "fp32"       # --fp32 on the CPU harness
        masks, _ = _post_npy(base + "/segment", imgs)
        assert masks.shape == (4, 32, 32)
    finally:
        t.join(timeout=120)
    assert not t.is_alive()
