"""Checkpointing: a pickle-free npz of flattened pytrees.

Schema parity with the reference's ``{"net": state_dict, "epoch": int}``
torch.save dicts (Train_Onet_on_simclutter_20250407.py:264-266,
Train_Onet_on_zy3_20240606.py:145-149): we store {params, bn_state,
epoch} and the same save points (final epoch + epoch 300) are driven by
the training loops. File naming keeps the reference's datehour mark.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: Dict[str, np.ndarray], prefix: str):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)

    def lookup(path, want):
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
        if key not in flat:
            raise KeyError(
                f"checkpoint has no '{key}' — its parameter tree does not "
                "match the requested model (a checkpoint trained with a "
                "different --arch, --base-channels or --in-channels? "
                "Note serving/quantization support the vanilla conv U-Net "
                "only.)")
        got = flat[key]
        want_shape = tuple(np.shape(want))
        if tuple(got.shape) != want_shape:
            raise ValueError(
                f"checkpoint '{key}' has shape {tuple(got.shape)} but the "
                f"requested model wants {want_shape} — trained with a "
                "different --base-channels/--in-channels/arch geometry?")
        return jnp.asarray(got)

    leaves = [lookup(path, leaf) for path, leaf in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def datehour_mark() -> str:
    now = datetime.now()
    return "%04d_%02d%02d_%02d" % (now.year, now.month, now.day, now.hour)


def save_checkpoint(path: str, params, bn_state, epoch: int, opt_state=None,
                    meta: dict = None):
    """Crash-safe save: write to a temp file in the target directory, then
    atomically rename. A process killed mid-write (preemption is the normal
    failure mode on TPU pools) can never leave a truncated npz behind the
    final name. (Additive over the reference's bare torch.save,
    Train_Onet_on_simclutter_20250407.py:264-266.)

    ``opt_state`` (optional) additionally stores the optimizer state under
    an 'o:' prefix so a resumed run keeps its Adam moments and step count —
    old checkpoints without it stay loadable.

    ``meta`` (optional) stores a small JSON dict (e.g. the backbone family
    and its geometry, models/arch.py) under '__meta__' so downstream
    surfaces (serve, nau) can rebuild the right model without flag
    bookkeeping; read it back with ``read_checkpoint_meta``."""
    flat = _flat_record(params, bn_state, epoch, opt_state, meta)
    _write_npz_atomic(path, flat)


def _flat_record(params, bn_state, epoch, opt_state=None, meta=None):
    """Host-side flat dict for one checkpoint — materializes every leaf
    with np.asarray (the device->host fetch happens HERE, so callers with
    donated buffers are safe to run the next step once this returns)."""
    flat = {"__epoch__": np.asarray(epoch)}
    flat.update(_flatten(params, "p:"))
    flat.update(_flatten(bn_state, "s:"))
    if opt_state is not None:
        flat.update(_flatten(opt_state, "o:"))
    if meta:
        import json
        flat["__meta__"] = np.asarray(json.dumps(meta))
    return flat


def _write_npz_atomic(path: str, flat):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class AsyncCheckpointWriter:
    """Overlap checkpoint file IO with training.

    ``save()`` fetches the arrays to host synchronously (the train steps
    donate their params/opt buffers, core/checkpoint.py callers run the
    next step immediately — the snapshot must happen first) and then
    serializes + atomically renames on a background thread, optionally
    running autosave rotation there too so the train loop pays only the
    transfer, never the file IO. At most one write is in flight: a second
    ``save()`` first joins the previous one (bounded memory, ordered
    files). ``wait()`` joins and re-raises any writer-thread error —
    drivers call it before reading back / finishing so a failed save
    cannot pass silently.
    """

    def __init__(self):
        self._thread = None
        self._err = None

    def save(self, path: str, params, bn_state, epoch: int, opt_state=None,
             meta: dict = None, rotate: tuple = None):
        """``rotate=(out_root, keep, pattern)`` runs rotate_checkpoints
        after the write completes (in the writer thread), so rotation
        always sees the finished file."""
        import threading

        self.wait()
        flat = _flat_record(params, bn_state, epoch, opt_state, meta)

        def write():
            try:
                _write_npz_atomic(path, flat)
                if rotate is not None:
                    out_root, keep, pattern = rotate
                    rotate_checkpoints(out_root, keep=keep, pattern=pattern)
            except BaseException as e:  # noqa: BLE001 — re-raised in wait()
                self._err = e

        self._thread = threading.Thread(target=write, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def read_checkpoint_meta(path: str) -> dict:
    """The '__meta__' JSON dict stored by save_checkpoint, or {} for
    checkpoints without one (pre-meta npz files, torch imports)."""
    if not path.endswith(".npz"):
        return {}
    import json
    with np.load(path) as z:
        if "__meta__" not in z.files:
            return {}
        return json.loads(str(z["__meta__"]))


def rotate_checkpoints(out_root: str, keep: int = 3,
                       pattern: str = "*.npz") -> list:
    """Keep the newest ``keep`` checkpoints matching ``pattern`` under
    ``out_root``; delete the rest. Returns the deleted paths. Rotation is
    by mtime, so periodic savers bound their disk use.

    Callers MUST scope ``pattern`` to their own autosave namespace (e.g.
    ``f"{model_name}_autosave_*.npz"``) — the default ``*.npz`` matches
    every checkpoint in the directory, including milestones."""
    import glob as _glob

    hits = sorted(_glob.glob(os.path.join(out_root, pattern)),
                  key=os.path.getmtime)
    doomed = hits[:-keep] if keep > 0 else hits
    for p in doomed:
        os.remove(p)
    return doomed


def latest_checkpoint(out_root: str, pattern: str = "*.npz"):
    """Newest checkpoint path under ``out_root`` (mtime order), or None —
    the auto-resume hook: drivers pass restart=True and call this instead
    of naming a file."""
    import glob as _glob

    hits = sorted(_glob.glob(os.path.join(out_root, pattern)),
                  key=os.path.getmtime)
    return hits[-1] if hits else None


def load_checkpoint(path: str, params_template, state_template,
                    opt_template=None):
    """Returns (params, bn_state, epoch) — or, when ``opt_template`` is
    given, (params, bn_state, epoch, opt_state_or_None); opt_state is None
    for pre-optimizer-state checkpoints (the caller should log that Adam
    moments restart). Templates supply the tree structure (shapes validated
    implicitly by assignment).

    Reference torch checkpoints (``.pt/.pth/.pytorch``, the
    ``{"net": state_dict, ...}`` schema) load transparently via
    ``core/torch_import.py`` — every CLI surface accepts them in place of
    an npz."""
    from onet_tpu.core.torch_import import (TORCH_EXTS,
                                            import_torch_checkpoint)
    if path.endswith(TORCH_EXTS):
        share = "down" not in params_template
        params, bn_state, epoch = import_torch_checkpoint(
            path, weight_share=share)
        for got, want, name in (
                (params, params_template, "params"),
                (bn_state, state_template, "bn_state")):
            gs = [x.shape for x in jax.tree.leaves(got)]
            ws = [np.shape(x) for x in jax.tree.leaves(want)]
            if gs != ws:
                raise ValueError(
                    f"{path}: imported {name} shapes do not match the "
                    f"requested model (got first-diff "
                    f"{next((a, b) for a, b in zip(gs, ws) if a != b)}); "
                    "check --base-channels/--in-channels")
        params = jax.tree.map(jnp.asarray, params)
        bn_state = jax.tree.map(jnp.asarray, bn_state)
        if opt_template is None:
            return params, bn_state, epoch
        return params, bn_state, epoch, None
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(params_template, flat, "p:")
    bn_state = _unflatten(state_template, flat, "s:")
    epoch = int(flat["__epoch__"])
    if opt_template is None:
        return params, bn_state, epoch
    has_opt = any(k.startswith("o:") for k in flat)
    opt_state = _unflatten(opt_template, flat, "o:") if has_opt else None
    return params, bn_state, epoch, opt_state


def load_arch_auto(path: str):
    """Load a checkpoint of ANY backbone family by its own metadata.

    Returns (arch, params, bn_state, epoch) where ``arch`` is the
    models/arch.py registry entry recorded in the checkpoint's
    '__meta__' (stamped by the train drivers). Meta-less npz files and
    reference torch imports resolve to the vanilla conv U-Net via
    ``load_onet_auto``'s shape inference, so every existing checkpoint
    keeps loading. This is the one-call model loader behind the eval
    surfaces (serve/nau/sweep) — no --arch/--base-channels bookkeeping.
    """
    from onet_tpu.models.arch import arch_from_meta

    meta = read_checkpoint_meta(path)
    arch = arch_from_meta(meta)
    if arch.vanilla:
        params, bn_state, epoch = load_onet_auto(path)
        return arch, params, bn_state, epoch
    params, bn_state = arch.init(
        jax.random.key(0), meta.get("in_channels", 1),
        weight_share=meta.get("weight_share", True))
    params, bn_state, epoch = load_checkpoint(path, params, bn_state)
    return arch, params, bn_state, epoch


def load_onet_auto(path: str):
    """Load an Onet checkpoint inferring its own architecture.

    Width (base channels), input channels, and twin-vs-shared weights are
    read from the file itself (npz key shapes, or the torch bridge's
    auto-detect for reference ``.pt/.pth/.pytorch`` files), so callers
    need no --base-channels/--in-channels bookkeeping for secondary
    models (e.g. the stage-2 / twin checkpoints of the NAU comparison
    figures, exp_nau_rain_20240513.py:327-339). Returns
    (params, bn_state, epoch).
    """
    from onet_tpu.core.torch_import import (TORCH_EXTS,
                                            import_torch_checkpoint)
    from onet_tpu.models.onet import onet_init
    if path.endswith(TORCH_EXTS):
        return import_torch_checkpoint(path)
    with np.load(path) as z:
        _, _, cin, base = z["p:top/inc/conv1/w"].shape
        twin = any(k.startswith("p:down/") for k in z.files)
    params, bn = onet_init(jax.random.key(0), cin, base=base,
                           weight_share=not twin)
    return load_checkpoint(path, params, bn)
