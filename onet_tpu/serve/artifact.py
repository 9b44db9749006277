"""AOT serving artifacts: single-file StableHLO deployment bundles.

``export_serving_artifact`` serializes the BN-folded inference graph via
``jax.export`` with the weights BAKED IN as module constants, producing one
self-contained ``.onetx`` file. Loading needs zero model code — the
deserialized module is called directly — so a trained model deploys to any
machine with jax installed (TPU or CPU; the artifact carries lowerings for
both platforms) without this package, its checkpoint format, or the
backbone definition. The batch dimension is exported SYMBOLIC by default:
one artifact serves any batch size, with XLA compiling per concrete batch
on first use (static H/W/C keep every compiled graph fully tiled for the
MXU).

This is an additive TPU-native deployment surface; the reference ships no
serving story at all (its entry points are per-script training drivers,
SURVEY.md L4 — Train_Onet_on_simclutter_20250407.py:609-618 run recipes).

File format (little-endian):

    bytes 0..7    magic  b"ONETX01\\0"
    bytes 8..15   uint64 header length N
    bytes 16..16+N json header (input spec, model metadata, versions)
    rest          jax.export serialized module (weights inside)
"""

from __future__ import annotations

import hashlib
import json
import struct

import numpy as np

MAGIC = b"ONETX01\x00"   # 8 bytes

# Serving artifacts must stay loadable by OLD readers as jax.export's
# calling convention evolves; pin the floor we guarantee (jax.export
# supports >= its minimum_supported_calling_convention_version).
_HEADER_VERSION = 1


def _call_fn(folded, policy, bias):
    """The exported computation: x [B,H,W,C] f32 -> (S f32, labels int32)."""
    import jax.numpy as jnp
    from onet_tpu.models.infer import onet_infer

    def fn(x):
        s, labels = onet_infer(folded, x, bias=bias, policy=policy)
        return s.astype(jnp.float32), labels.astype(jnp.int32)

    return fn


def export_serving_artifact(params, bn_state, out_path, *,
                            input_hw, in_channels=1, batch=None,
                            policy=None, bias=0.0,
                            platforms=("tpu", "cpu"),
                            int8_calib=None, head_bf16=True,
                            extra_meta=None) -> dict:
    """Export the folded serving graph for ``(params, bn_state)``.

    batch=None exports a SYMBOLIC batch dimension (any batch size at call
    time); an int pins it (the artifact then only accepts that batch).
    ``int8_calib`` (a [B,H,W,C] calibration batch in [0,1]) bakes the
    int8 PTQ graph instead (models/quant.py — ~2x MXU rate on TPU, under
    the usual >=99% mask-agreement contract; validate on your checkpoint
    first). Returns the header metadata dict that was written.
    """
    import jax
    import jax.numpy as jnp
    from onet_tpu.core.policy import BF16_COMPUTE
    from onet_tpu.models.infer import fold_onet
    from onet_tpu.utils.summary import count_parameters

    policy = policy or BF16_COMPUTE
    folded = jax.jit(fold_onet)(params, bn_state)
    if int8_calib is not None:
        from onet_tpu.models.onet import is_weight_shared
        from onet_tpu.models.quant import (
            calibrate, onet_infer_q, quantize_folded)
        if not is_weight_shared(params):
            raise ValueError("int8 artifacts require the weight-shared "
                             "model (the quantized graph is the stacked "
                             "twin pass; models/quant.py)")
        scales = calibrate(folded, jnp.asarray(int8_calib), bias=bias,
                           policy=policy)
        q = quantize_folded(folded, scales)

        def fn(x):
            s, labels = onet_infer_q(q, x, bias=bias, head_bf16=head_bf16)
            return s.astype(jnp.float32), labels.astype(jnp.int32)

        arithmetic = "int8" + ("+bf16head" if head_bf16 else "")
    else:
        fn = _call_fn(folded, policy, bias)
        arithmetic = np.dtype(policy.compute_dtype).name

    meta = {"bias": float(bias), "arithmetic": arithmetic,
            "params_m": round(float(count_parameters(params)), 4)}
    if extra_meta:
        meta.update(extra_meta)
    return export_fn_artifact(fn, out_path, input_hw=input_hw,
                              in_channels=in_channels, batch=batch,
                              platforms=platforms, extra_meta=meta)


def export_fn_artifact(fn, out_path, *, input_hw, in_channels, batch=None,
                       platforms=("tpu", "cpu"), extra_meta=None) -> dict:
    """Export any ``fn(x [B,H,W,C] f32) -> (S f32, labels i32)`` serving
    step (weights closed over become module constants). The generic
    writer behind export_serving_artifact; non-vanilla backbone families
    export their plain forward through this."""
    import jax
    from jax import export as jexport

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    h, w = input_hw
    spec = jax.ShapeDtypeStruct((b, h, w, in_channels), np.float32)
    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "header_version": _HEADER_VERSION,
        "input_hw": [int(h), int(w)],
        "in_channels": int(in_channels),
        "batch": "symbolic" if batch is None else int(batch),
        "platforms": list(platforms),
        "output": ["S float32 [B,H,W,2]", "labels int32 [B,H,W]"],
        "jax_version": jax.__version__,
        "calling_convention": exported.calling_convention_version,
        # integrity guard: a truncated/corrupted deployment copy fails
        # at load with a clear message instead of a deserializer crash
        "blob_sha256": hashlib.sha256(blob).hexdigest(),
    }
    if extra_meta:
        meta.update(extra_meta)
    head = json.dumps(meta).encode()
    with open(out_path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(head)))
        f.write(head)
        f.write(blob)
    return meta


def _read_container(path, *, want_blob):
    """Parse the container; every malformation (bad magic, truncated
    prefix/header/module, unreadable JSON, future header version) raises
    ValueError with a clear message. Returns (meta, blob-or-None)."""
    with open(path, "rb") as f:
        prefix = f.read(16)
        if prefix[:8] != MAGIC:
            raise ValueError(
                f"{path}: not a serving artifact (magic {prefix[:8]!r}; "
                f"expected {MAGIC!r} — export one with `onet_tpu "
                "export-artifact`)")
        if len(prefix) < 16:
            raise ValueError(f"{path}: truncated artifact (only "
                             f"{len(prefix)} bytes of the 16-byte prefix)")
        (n,) = struct.unpack("<Q", prefix[8:16])
        head = f.read(n)
        if len(head) < n:
            raise ValueError(f"{path}: truncated artifact header "
                             f"({len(head)} of {n} bytes)")
        try:
            meta = json.loads(head.decode())
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(
                f"{path}: corrupted artifact header ({e})") from None
        if meta.get("header_version", 1) > _HEADER_VERSION:
            raise ValueError(
                f"{path}: artifact header v{meta['header_version']} > "
                f"supported v{_HEADER_VERSION} — upgrade this package to "
                "load it")
        blob = None
        if want_blob:
            blob = f.read()
            want = meta.get("blob_sha256")
            if want and hashlib.sha256(blob).hexdigest() != want:
                raise ValueError(
                    f"{path}: module bytes do not match the header "
                    "checksum — the artifact is truncated or corrupted; "
                    "re-copy or re-export")
        return meta, blob


def read_artifact_meta(path) -> dict:
    """Header metadata only (no jax import, no deserialization)."""
    return _read_container(path, want_blob=False)[0]


def load_serving_artifact(path):
    """Load ``path`` -> ``(call, meta)``.

    ``call(x)`` takes [B,H,W,C] float32 (B free if the artifact was
    exported with a symbolic batch) and returns ``(S, labels)`` — the same
    contract as the checkpoint serving step, so the detector / tiling /
    HTTP pipeline composes unchanged. The call is jit-wrapped; compiled
    executables cache per concrete batch shape.
    """
    import jax
    from jax import export as jexport

    meta, blob = _read_container(path, want_blob=True)
    exported = jexport.deserialize(blob)
    call = jax.jit(exported.call)

    def artifact_call(x):
        x = jax.numpy.asarray(x, dtype=jax.numpy.float32)
        expect = (meta["input_hw"][0], meta["input_hw"][1],
                  meta["in_channels"])
        if tuple(x.shape[1:]) != expect:
            raise ValueError(
                f"artifact expects input [B, {expect[0]}, {expect[1]}, "
                f"{expect[2]}]; got {tuple(x.shape)} (artifacts carry "
                "static H/W/C — tile larger scenes with serve --tile, or "
                "re-export at this size)")
        if meta["batch"] != "symbolic" and x.shape[0] != meta["batch"]:
            raise ValueError(
                f"artifact was exported with a pinned batch of "
                f"{meta['batch']}; got {x.shape[0]} (re-export with "
                "--serve-batch 0 for a symbolic batch)")
        return call(x)

    return artifact_call, meta


def is_artifact(path) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(8) == MAGIC
    except OSError:
        return False
