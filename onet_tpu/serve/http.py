"""Persistent HTTP serving daemon: the compiled graph stays warm.

The reference has no serving story — every eval script reloads the model
and exits (`exp_nau_rain_20240513.py:535-580`, `uti_zy3_test_20240123.py`);
a production radar / remote-sensing deployment wants a resident process
that pays XLA compilation once and answers requests at device speed.
``run serve --model ck.npz --http PORT`` builds the same serving pipeline
as batch mode (bf16 or int8 PTQ, optional detector thresholding, optional
data-parallel shard_map, optional tiling for large scenes) and then serves
it over plain HTTP instead of a file pass:

    POST /segment        body = a numpy ``.npy`` payload, float imagery in
                         [0, 1]: [H, W], [H, W, C], [B, H, W] or
                         [B, H, W, C]. Response = ``.npy`` uint8 masks
                         [B, H, W]. Query params:
                           ?normalize=1  per-frame min-max first (the
                                         reference's tensor_normal_per_frame)
                           ?scene=1      route each frame through the tiled
                                         path (arbitrary scene sizes; only
                                         valid when the daemon was started
                                         with --tile)
    GET  /healthz        JSON: model, mode, compiled batch, warm state
    GET  /stats          JSON: request/frame counts, device + end-to-end
                         latency percentiles

Engineering notes (TPU-shaped):
  * ONE compiled shape. Requests of any batch size are padded to the
    compiled ``batch`` and run in fixed-shape chunks — no recompilation,
    ever. Scenes (?scene=1) reuse the tiled window graph the same way.
  * The device step is serialized by a lock (one chip, one graph); the
    HTTP layer is a ``ThreadingHTTPServer`` so health/stat probes never
    queue behind inference.
  * Everything is stdlib — no flask/fastapi in the image, none needed.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class ServingSession:
    """Owns the warm serving step and its statistics."""

    def __init__(self, step, model_arg, *, batch: int, in_channels: int,
                 mode: str = "bf16", model_name: str = "",
                 tile: int = 0, halo: int = 32, input_hw=None):
        self.step = step                  # (model_arg, [B,H,W,C]) -> (s, m)
        self.model_arg = model_arg
        self.batch = int(batch)
        self.in_channels = int(in_channels)
        self.mode = mode
        self.model_name = model_name
        self.tile = int(tile)
        self.halo = int(halo)
        self.input_hw = input_hw          # (H, W) the graph is warm at
        self.warm = False
        self._lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.requests = 0
        self.frames = 0
        self.errors = 0
        self._lat_device_ms: list = []
        self._lat_total_ms: list = []
        self.started = time.time()

    # -- device work --------------------------------------------------------

    def warmup(self, hw=None):
        """Compile-and-run the fixed-shape graph once so the first request
        is served at device speed."""
        import jax.numpy as jnp
        if self.tile:
            hw = (self.tile + 2 * self.halo,) * 2
        elif hw is None:
            hw = self.input_hw or (224, 224)
        x = jnp.zeros((self.batch, hw[0], hw[1], self.in_channels),
                      jnp.float32)
        with self._lock:
            _, m = self.step(self.model_arg, x)
            np.asarray(m)                # real device->host sync (axon)
        self.input_hw = tuple(hw)
        self.warm = True

    def segment(self, imgs: np.ndarray, normalize: bool = False):
        """[B, H, W, C] float -> [B, H, W] uint8 masks, fixed-shape chunks."""
        import jax.numpy as jnp
        from onet_tpu.ops.normalize import minmax_per_frame

        n = imgs.shape[0]
        pad = (-n) % self.batch
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        masks, dev_ms = [], 0.0
        for i in range(0, imgs.shape[0], self.batch):
            xb = jnp.asarray(imgs[i:i + self.batch])
            if normalize:
                xb = minmax_per_frame(xb)
            t0 = time.perf_counter()
            with self._lock:
                _, m = self.step(self.model_arg, xb)
                m = np.asarray(m)        # sync
            dev_ms += (time.perf_counter() - t0) * 1e3
            masks.append(m.astype(np.uint8))
        return np.concatenate(masks)[:n], dev_ms

    def segment_scenes(self, imgs: np.ndarray, normalize: bool = False):
        """Tiled path: each [H, W, C] frame through the window graph."""
        import jax.numpy as jnp
        from onet_tpu.ops.normalize import minmax_per_frame
        from onet_tpu.serve.tiles import infer_tiled

        if not self.tile:
            raise ValueError("daemon started without --tile; "
                             "?scene=1 unavailable")
        out, dev_ms = [], 0.0
        for scene in imgs:
            if normalize:
                scene = np.asarray(minmax_per_frame(
                    jnp.asarray(scene[None])))[0]
            t0 = time.perf_counter()
            with self._lock:
                m = infer_tiled(self.step, self.model_arg, scene,
                                tile=self.tile, halo=self.halo,
                                batch=self.batch)
            dev_ms += (time.perf_counter() - t0) * 1e3
            out.append(m[None].astype(np.uint8))
        return np.concatenate(out), dev_ms

    # -- bookkeeping ---------------------------------------------------------

    def record(self, frames: int, dev_ms: float, total_ms: float):
        with self._stats_lock:
            self.requests += 1
            self.frames += frames
            self._lat_device_ms.append(dev_ms)
            self._lat_total_ms.append(total_ms)
            if len(self._lat_total_ms) > 4096:     # bounded memory
                self._lat_device_ms = self._lat_device_ms[-2048:]
                self._lat_total_ms = self._lat_total_ms[-2048:]

    def health(self) -> dict:
        return {"status": "ok" if self.warm else "warming",
                "model": self.model_name, "mode": self.mode,
                "batch": self.batch, "in_channels": self.in_channels,
                "tile": self.tile or None,
                "input_hw": list(self.input_hw) if self.input_hw else None,
                "uptime_s": round(time.time() - self.started, 1)}

    def stats(self) -> dict:
        with self._stats_lock:
            dev = np.asarray(self._lat_device_ms, np.float64)
            tot = np.asarray(self._lat_total_ms, np.float64)

            def pct(a):
                if a.size == 0:
                    return None
                return {"p50": round(float(np.percentile(a, 50)), 2),
                        "p95": round(float(np.percentile(a, 95)), 2),
                        "max": round(float(a.max()), 2)}

            return {"requests": self.requests, "frames": self.frames,
                    "errors": self.errors,
                    "device_ms": pct(dev), "total_ms": pct(tot)}


def canonicalize(arr: np.ndarray, in_channels: int) -> np.ndarray:
    """Any of [H,W] / [H,W,C] / [B,H,W] / [B,H,W,C] -> [B,H,W,C] float32."""
    a = np.asarray(arr)
    if not np.issubdtype(a.dtype, np.number):
        raise ValueError(f"non-numeric payload dtype {a.dtype}")
    a = a.astype(np.float32)
    if a.ndim == 2:
        a = a[None, :, :, None]
    elif a.ndim == 3:
        # trailing channel dim vs leading batch dim: channels are small
        a = a[None] if a.shape[-1] == in_channels else a[..., None]
    elif a.ndim != 4:
        raise ValueError(f"expected 2-4 dims, got shape {a.shape}")
    if a.shape[-1] != in_channels:
        raise ValueError(f"expected {in_channels} channel(s), "
                         f"got shape {tuple(a.shape)}")
    return a


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def make_handler(session: ServingSession):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # quiet by default; errors still surface in responses
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, session.health())
            elif path == "/stats":
                self._json(200, session.stats())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/segment":
                self._json(404, {"error": f"unknown path {url.path}"})
                return
            q = parse_qs(url.query)
            normalize = q.get("normalize", ["0"])[0] not in ("0", "")
            scene = q.get("scene", ["0"])[0] not in ("0", "")
            t_req = time.perf_counter()
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = io.BytesIO(self.rfile.read(n))
                imgs = canonicalize(np.load(payload, allow_pickle=False),
                                    session.in_channels)
                if scene:
                    masks, dev_ms = session.segment_scenes(imgs, normalize)
                else:
                    masks, dev_ms = session.segment(imgs, normalize)
            except Exception as e:  # noqa: BLE001 — surfaced to the client
                session.errors += 1
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            total_ms = (time.perf_counter() - t_req) * 1e3
            session.record(masks.shape[0], dev_ms, total_ms)
            body = _npy_bytes(masks)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npy")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Onet-Frames", str(masks.shape[0]))
            self.send_header("X-Onet-Device-Ms", f"{dev_ms:.2f}")
            self.send_header("X-Onet-Mode", session.mode)
            self.end_headers()
            self.wfile.write(body)

    return Handler


def start_server(session: ServingSession, port: int,
                 host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral) and return the httpd; the caller drives
    ``serve_forever()`` (CLI) or ``handle_request()`` (tests)."""
    httpd = ThreadingHTTPServer((host, port), make_handler(session))
    httpd.daemon_threads = True
    return httpd
