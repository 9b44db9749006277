"""Architecture registry: pluggable backbones for the Onet container.

The reference's ablation surface swaps the U-Net backbone while keeping
the twin/complement/projection/JSD machinery
(Train_Onet_on_zy3_20240606.py:313-382 instantiates Onet_Swin_Unet /
Onet_Trans_Unet / Onet_ConvNeXt variants; the model modules are absent
from the snapshot, SURVEY.md section 2.9). This registry is the rebuilt
counterpart: every arch exposes the same (init, forward) pair so the
train/eval steps and drivers stay backbone-agnostic.

``init(key, in_channels, *, weight_share=True, base=64, dtype=...)``
returns (params, state); ``forward(params, state, x, *, train, bias,
policy)`` returns (OnetOutput, state). Only the vanilla conv U-Net
supports the conv-specific machinery (channel stacking, halo resharding,
int8 training ops, BN-folded serving, pipeline/tensor parallel stages).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp

ARCH_NAMES = ("vanilla", "swin", "convnext", "transunet")

GEOMETRY_KEYS = {
    "vanilla": (),
    "swin": ("swin_window", "swin_embed"),
    "convnext": ("convnext_embed",),
    "transunet": ("transunet_embed", "transunet_depth"),
}


def arch_meta(config) -> dict:
    """Checkpoint metadata describing the model a driver config builds
    (stored via core.checkpoint.save_checkpoint(meta=...)): the backbone
    family plus exactly the geometry knobs that family consumes, so
    downstream surfaces (serve/nau) rebuild the right model with no flag
    bookkeeping. ``config`` is any object with the driver-config fields
    (SimclutterConfig / Zy3Config)."""
    name = getattr(config, "arch", "vanilla") or "vanilla"
    meta = {"arch": name,
            "in_channels": int(config.in_channels),
            "weight_share": bool(config.weight_share)}
    if name == "vanilla":
        meta["base_channels"] = int(config.base_channels)
    for k in GEOMETRY_KEYS[name]:
        meta[k] = int(getattr(config, k))
    return meta


def arch_from_meta(meta: dict):
    """get_arch from a read_checkpoint_meta dict ({} -> vanilla)."""
    name = meta.get("arch", "vanilla")
    kw = {k: meta[k] for k in GEOMETRY_KEYS.get(name, ()) if k in meta}
    return get_arch(name, **kw)


def get_arch(name: str = None, *, swin_window: int = 7,
             swin_embed: int = 96, convnext_embed: int = 96,
             transunet_embed: int = 768, transunet_depth: int = 12):
    """Resolve an architecture by name. ``swin_*`` shape the transformer
    variant (window 7 fits 224^2 inputs, 8 fits 512^2; embed 96 is the
    published Swin-T width — smaller multiples of 3 shrink it for tests);
    ``convnext_embed`` scales the ConvNeXt-T width the same way;
    ``transunet_*`` scale the hybrid ViT (768/12 is the published ViT-B
    geometry; embed must stay divisible by 48)."""
    name = name or "vanilla"
    if name == "vanilla":
        from onet_tpu.models.onet import onet_init, onet_forward
        return SimpleNamespace(name=name, init=onet_init,
                               forward=onet_forward, vanilla=True)
    if name == "swin":
        from onet_tpu.models.swin import swin_onet_init, swin_onet_forward

        def init(key, in_channels=1, *, weight_share=True, base=64,
                 dtype=jnp.float32):
            if base != 64:
                raise ValueError("--arch swin sizes via --swin-embed, "
                                 "not --base-channels")
            return swin_onet_init(key, in_channels,
                                  weight_share=weight_share,
                                  window=swin_window, embed_dim=swin_embed,
                                  dtype=dtype)

        return SimpleNamespace(name=name, init=init,
                               forward=swin_onet_forward, vanilla=False)
    if name == "convnext":
        from onet_tpu.models.convnext import (convnext_onet_forward,
                                              convnext_onet_init)

        def init(key, in_channels=1, *, weight_share=True, base=64,
                 dtype=jnp.float32):
            if base != 64:
                raise ValueError("--arch convnext sizes via "
                                 "--convnext-embed, not --base-channels")
            return convnext_onet_init(key, in_channels,
                                      weight_share=weight_share,
                                      embed_dim=convnext_embed, dtype=dtype)

        return SimpleNamespace(name=name, init=init,
                               forward=convnext_onet_forward, vanilla=False)
    if name == "transunet":
        from onet_tpu.models.transunet import (transunet_onet_forward,
                                               transunet_onet_init)

        def init(key, in_channels=1, *, weight_share=True, base=64,
                 dtype=jnp.float32):
            if base != 64:
                raise ValueError("--arch transunet sizes via "
                                 "--transunet-embed, not --base-channels")
            return transunet_onet_init(key, in_channels,
                                       weight_share=weight_share,
                                       embed_dim=transunet_embed,
                                       depth=transunet_depth, dtype=dtype)

        return SimpleNamespace(name=name, init=init,
                               forward=transunet_onet_forward, vanilla=False)
    raise ValueError(f"unknown arch {name!r}; choose from {ARCH_NAMES}")
