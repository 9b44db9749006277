"""Model and data inspection utilities.

Reference counterparts in utils_20231218.py: count_parameters (:29-42),
print_parameters_statics / compare_top_dwn_parameters_statics (:44-89,
the weight-share gradient-flow debug aids), get_model_summary (:692-811,
the forward-hook FLOP/param table), and get_scr
(Rayleigh_bg_Gaussian_EOT_generator_20230208.py:277-294).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp


def count_parameters(params) -> float:
    """Trainable parameter count in millions (reference prints M units)."""
    return sum(int(x.size) for x in jax.tree.leaves(params)) / 1e6


def parameter_statistics(params) -> Dict[str, Dict[str, float]]:
    """Per-leaf mean/std/absmax — the weight-share debugging aid."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        arr = np.asarray(leaf)
        out[name] = {"mean": float(arr.mean()), "std": float(arr.std()),
                     "absmax": float(np.abs(arr).max()),
                     "shape": tuple(arr.shape)}
    return out


def compare_parameter_trees(a, b, atol: float = 0.0) -> List[str]:
    """Names of leaves that differ (empty list == trees identical, the
    weight-share invariant check)."""
    diffs = []
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    for (pa, la), (_, lb) in zip(fa, fb):
        if not np.allclose(np.asarray(la), np.asarray(lb), atol=atol):
            diffs.append("/".join(str(getattr(p, "key", p)) for p in pa))
    return diffs


def _conv_flops(h, w, kh, kw, cin, cout):
    return 2 * h * w * kh * kw * cin * cout


def model_summary(params, input_hw=(224, 224), in_channels=1,
                  batch: int = 1) -> List[Dict]:
    """Static per-stage table (name, params, output shape, fwd FLOPs) for
    the weight-shared U-Net — the analogue of the reference's hook-based
    summary, derived from shapes instead of a live forward."""
    rows = []
    h, w = input_hw
    tree = params["top"] if "top" in params else params

    def dconv_row(name, p, h, w, cin):
        c1 = p["conv1"]["w"].shape[-1]
        c2 = p["conv2"]["w"].shape[-1]
        flops = (_conv_flops(h, w, 3, 3, cin, c1)
                 + _conv_flops(h, w, 3, 3, c1, c2))
        n_params = sum(int(x.size) for x in jax.tree.leaves(p))
        rows.append({"name": name, "out_shape": (batch, h, w, c2),
                     "params": n_params, "fwd_flops": batch * flops})
        return c2

    c = dconv_row("inc", tree["inc"], h, w, in_channels)
    skip_hw = [(h, w)]
    for i in range(1, 5):
        h, w = h // 2, w // 2
        c = dconv_row(f"down{i}", tree[f"down{i}"], h, w, c)
        skip_hw.append((h, w))
    for i in range(1, 5):
        up = tree[f"up{i}"]
        cin = up["up"]["w"].shape[2]
        cup = up["up"]["w"].shape[3]
        h, w = skip_hw[4 - i]          # up{i} lands on the matching skip size
        # k=2 s=2 transpose conv: each output pixel costs one cin*cup MAC
        tflops = 2 * h * w * cin * cup
        n_up = sum(int(x.size) for x in jax.tree.leaves(up["up"]))
        rows.append({"name": f"up{i}/transpose", "out_shape": (batch, h, w, cup),
                     "params": n_up, "fwd_flops": batch * tflops})
        c = dconv_row(f"up{i}/conv", up["conv"], h, w, cup * 2)
    total = {"name": "TOTAL",
             "out_shape": None,
             "params": sum(r["params"] for r in rows),
             "fwd_flops": sum(r["fwd_flops"] for r in rows)}
    rows.append(total)
    return rows


def runtime_layer_summary(params, state, x, *, train: bool = False) -> List[Dict]:
    """Per-layer output shapes/dtypes from a LIVE traced forward — the
    counterpart of the reference's forward-hook summary
    (utils_20231218.py:692-811), realized the JAX way: intercept the layer
    primitives during one abstract evaluation (jax.eval_shape, so no
    device work and any input size).

    Returns rows {name, op, out_shape, out_dtype} in execution order.
    Complements model_summary's static FLOP/param table with what the
    traced graph actually produces (padding, stacking and policy casts
    included)."""
    import types

    from onet_tpu.models import layers as L
    from onet_tpu.models import unet as U
    from onet_tpu.models.onet import onet_forward

    rows = []

    def tap(op):
        fn = getattr(L, op)

        def wrapped(*args, **kwargs):
            out = fn(*args, **kwargs)
            y = out[0] if isinstance(out, tuple) else out
            rows.append({"name": f"{op}_{len(rows)}", "op": op,
                         "out_shape": tuple(y.shape),
                         "out_dtype": str(y.dtype)})
            return out
        return wrapped

    ops = types.SimpleNamespace(
        conv3x3=tap("conv3x3"),
        batch_norm=tap("batch_norm"),
        max_pool=tap("max_pool_2x2"),
        conv_transpose=tap("conv_transpose_2x2"),
    )

    def fwd(p, s, xx):
        out, _ = onet_forward(p, s, xx, train=train, ops=ops,
                              pair_pack=False)
        return out.S

    jax.eval_shape(fwd, params, state, x)
    return rows


def scr_db(image: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-clutter ratio of the labelled extended target (dB),
    jittable (no host fetch); get_scr is the eager float wrapper."""
    lab = label.astype(image.dtype)
    sig = jnp.sum(jnp.square(lab * image)) / jnp.maximum(jnp.sum(lab == 1), 1)
    noi = jnp.sum(jnp.square((1 - lab) * image)) / jnp.maximum(jnp.sum(lab == 0), 1)
    return 10.0 * jnp.log10(sig / noi)


def get_scr(image: jnp.ndarray, label: jnp.ndarray) -> float:
    """Signal-to-clutter ratio of the labelled extended target (dB)."""
    return float(scr_db(image, label))
