"""Import reference torch checkpoints into onet-tpu pytrees.

The reference trains in PyTorch and saves ``{"net": Onet.state_dict(),
"epoch": int}`` (``Train_Onet_on_simclutter_20250407.py:265-266``; the zy3
driver uses ``"save_epoch"``, ``Train_Onet_on_zy3_20240606.py:145-149``)
with ``.pytorch`` filenames. A user switching frameworks brings those
files; this module converts them to our ``(params, bn_state)`` trees so
every onet-tpu surface (serve, sweep, nau transfer, xlsx reports, int8
PTQ) runs on reference-trained weights without retraining.

state_dict key schema (``Onet_vanilla_20240606.py:39-172`` module naming):

    topu.inc.double_conv.{0,3}.weight                 3x3 convs, OIHW
    topu.inc.double_conv.{1,4}.{weight,bias,
        running_mean,running_var,num_batches_tracked} BatchNorm2d
    topu.down{i}.maxpool_conv.1.double_conv.*         i in 1..4
    topu.up{i}.up.{weight,bias}                       ConvTranspose2d, IOHW
    topu.up{i}.conv.double_conv.*
    dwnu.*                                            twin branch; aliases
                                                      topu.* when bshare

Layout conversion: conv OIHW -> HWIO; convT (in,out,kh,kw) -> (kh,kw,in,out)
— the same transposes the parity oracle uses (tests/test_model_parity.py).
"""

from __future__ import annotations

import numpy as np

TORCH_EXTS = (".pt", ".pth", ".pytorch")


def _np(t) -> np.ndarray:
    """torch tensor / ndarray -> float32 numpy DEEP copy (jnp.asarray on CPU
    can zero-copy-alias torch storage; see tests/test_model_parity.py)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.array(t, dtype=np.float32, copy=True)


def _conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)        # OIHW -> HWIO


def _convt_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 0, 1)        # (I,O,kh,kw) -> (kh,kw,I,O)


def _import_double_conv(sd, prefix: str):
    """One DoubleConv at torch ``prefix`` (ending in 'double_conv.')."""
    p = {"conv1": {"w": _conv_w(sd[prefix + "0.weight"])},
         "bn1": {"scale": _np(sd[prefix + "1.weight"]),
                 "bias": _np(sd[prefix + "1.bias"])},
         "conv2": {"w": _conv_w(sd[prefix + "3.weight"])},
         "bn2": {"scale": _np(sd[prefix + "4.weight"]),
                 "bias": _np(sd[prefix + "4.bias"])}}
    s = {"bn1": {"mean": _np(sd[prefix + "1.running_mean"]),
                 "var": _np(sd[prefix + "1.running_var"])},
         "bn2": {"mean": _np(sd[prefix + "4.running_mean"]),
                 "var": _np(sd[prefix + "4.running_var"])}}
    return p, s


def _import_unet(sd, unet: str):
    """One UNet branch ('topu' or 'dwnu') -> (params, state) trees matching
    ``models/unet.py::unet_init`` structure."""
    params, state = {}, {}
    params["inc"], state["inc"] = _import_double_conv(
        sd, f"{unet}.inc.double_conv.")
    for i in range(1, 5):
        params[f"down{i}"], state[f"down{i}"] = _import_double_conv(
            sd, f"{unet}.down{i}.maxpool_conv.1.double_conv.")
    for i in range(1, 5):
        cp, cs = _import_double_conv(sd, f"{unet}.up{i}.conv.double_conv.")
        params[f"up{i}"] = {
            "up": {"w": _convt_w(sd[f"{unet}.up{i}.up.weight"]),
                   "b": _np(sd[f"{unet}.up{i}.up.bias"])},
            "conv": cp}
        state[f"up{i}"] = {"conv": cs}
    return params, state


def import_torch_state(sd, *, weight_share=None):
    """Convert a reference Onet ``state_dict`` to ``(params, bn_state)``.

    ``weight_share=None`` auto-detects: the weight-shared reference model
    registers the SAME UNet under both ``topu`` and ``dwnu`` (aliased
    tensors in the state_dict), so the branches compare equal; a twin
    (bshare=False) checkpoint has independent values and yields a
    ``{"top", "down"}`` tree.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    probe = "inc.double_conv.0.weight"
    if f"topu.{probe}" not in sd:
        raise KeyError(
            "not a reference Onet state_dict: missing 'topu.%s' "
            "(keys look like: %s)" % (probe, sorted(sd)[:3]))
    if weight_share is None:
        weight_share = (f"dwnu.{probe}" not in sd or
                        np.array_equal(_np(sd[f"topu.{probe}"]),
                                       _np(sd[f"dwnu.{probe}"])))
    pt, st = _import_unet(sd, "topu")
    if weight_share:
        return {"top": pt}, {"top": st}
    pd, sdn = _import_unet(sd, "dwnu")
    return {"top": pt, "down": pd}, {"top": st, "down": sdn}


def _export_double_conv(sd, prefix: str, p, s):
    sd[prefix + "0.weight"] = _np(p["conv1"]["w"]).transpose(3, 2, 0, 1)
    sd[prefix + "1.weight"] = _np(p["bn1"]["scale"])
    sd[prefix + "1.bias"] = _np(p["bn1"]["bias"])
    sd[prefix + "1.running_mean"] = _np(s["bn1"]["mean"])
    sd[prefix + "1.running_var"] = _np(s["bn1"]["var"])
    sd[prefix + "3.weight"] = _np(p["conv2"]["w"]).transpose(3, 2, 0, 1)
    sd[prefix + "4.weight"] = _np(p["bn2"]["scale"])
    sd[prefix + "4.bias"] = _np(p["bn2"]["bias"])
    sd[prefix + "4.running_mean"] = _np(s["bn2"]["mean"])
    sd[prefix + "4.running_var"] = _np(s["bn2"]["var"])


def export_torch_state(params, bn_state):
    """Inverse of :func:`import_torch_state`: build a reference-schema
    state_dict (numpy values) from our trees. A weight-shared tree emits
    BOTH ``topu.*`` and ``dwnu.*`` entries — the reference's shared model
    registers the same UNet twice, so ``load_state_dict`` (strict) expects
    both. ``num_batches_tracked`` counters are emitted as zeros (the
    reference's BN uses fixed momentum, so the counter is inert)."""
    sd = {}
    branches = [("topu", "top"), ("dwnu", "down" if "down" in params
                                  else "top")]
    for unet, key in branches:
        p, s = params[key], bn_state[key]
        _export_double_conv(sd, f"{unet}.inc.double_conv.", p["inc"],
                            s["inc"])
        for i in range(1, 5):
            _export_double_conv(
                sd, f"{unet}.down{i}.maxpool_conv.1.double_conv.",
                p[f"down{i}"], s[f"down{i}"])
        for i in range(1, 5):
            sd[f"{unet}.up{i}.up.weight"] = _np(
                p[f"up{i}"]["up"]["w"]).transpose(2, 3, 0, 1)
            sd[f"{unet}.up{i}.up.bias"] = _np(p[f"up{i}"]["up"]["b"])
            _export_double_conv(sd, f"{unet}.up{i}.conv.double_conv.",
                                p[f"up{i}"]["conv"], s[f"up{i}"]["conv"])
    for k in [k for k in sd if k.endswith("running_mean")]:
        sd[k[:-len("running_mean")] + "num_batches_tracked"] = (
            np.zeros((), np.int64))
    return sd


def export_torch_checkpoint(path: str, params, bn_state, epoch: int = 0):
    """Save our trees as a reference-loadable torch checkpoint
    (``{"net": state_dict, "epoch": N}``) so models trained here run in
    the reference's own scripts (``onet.load_state_dict(torch.load(f)
    ['net'])``, Train_Onet_on_simclutter_20250407.py:493)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state(params, bn_state).items()}
    torch.save({"net": sd, "epoch": int(epoch)}, path)
    return path


def import_torch_checkpoint(path: str, *, weight_share=None):
    """Load a reference ``.pt/.pth/.pytorch`` checkpoint file.

    Accepts the reference save schemas — ``{"net": sd, "epoch": e}``
    (simclutter driver) and ``{"net": sd, "save_epoch": e}`` (zy3 driver) —
    or a bare state_dict. Returns ``(params, bn_state, epoch)``.
    """
    import torch  # CPU-only torch is baked in; used only for deserializing

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        blob = torch.load(path, map_location="cpu")

    epoch = 0
    if isinstance(blob, dict) and "net" in blob:
        epoch = int(blob.get("epoch", blob.get("save_epoch", 0)))
        sd = blob["net"]
    elif isinstance(blob, dict) and all("." in k for k in blob):
        sd = blob                     # bare state_dict
    else:
        raise ValueError(
            f"{path}: expected a reference checkpoint dict with a 'net' "
            f"state_dict or a bare state_dict; got {type(blob).__name__} "
            f"with keys {list(blob)[:4] if isinstance(blob, dict) else ''}")
    params, bn_state = import_torch_state(sd, weight_share=weight_share)
    return params, bn_state, epoch
