"""TPU probe for the one-pass-LayerNorm NaN (regression artifact).

On the real chip, TransUNet's 2-channel dec3 stage (embed 96 -> D/48 = 2)
NaN'd under jax.grad at bf16: the E[x^2]-E[x]^2 variance form cancelled to
var ~ -1e-2 — far beyond eps=1e-5 — and rsqrt(var+eps) went NaN. This
script opens the dec3 stage and prints per-intermediate finiteness plus
the one-pass var minimum (still negative on TPU, documenting why
models/swin.py::_layer_norm uses the two-pass mean((x-mu)^2) form, which
is non-negative under any rounding). Expected output after the fix: all
stages finite, var_min < 0.

Run on the TPU host: python runs/ln_nan_probe.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
import jax.numpy as jnp
from onet_tpu.core.policy import BF16_COMPUTE as PL
from onet_tpu.models.transunet import (transunet_init, _conv, _vit_block,
                                       _upsample2x, _dense, _layer_norm)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0, 1, (4, 128, 128, 1)).astype(np.float32))
params = transunet_init(jax.random.key(0), 1, embed_dim=96, depth=2)
xx = jnp.concatenate([x0, jnp.clip(1 - x0, 0, 1)], axis=0)

def stages(p, x):
    out = {}
    e = PL.cast_compute(x)
    skips = []
    for i in range(3):
        pp = p[f"pyr{i}"]
        e = jax.nn.gelu(_layer_norm(_conv(e, pp, 2, PL), pp["ln"]))
        skips.append(e)
    t = _conv(e, p["embed"], 2, PL, padding="VALID")
    gh, gw = t.shape[1], t.shape[2]
    d = t.shape[-1]
    pos = p["pos"].astype(jnp.float32)
    if pos.shape[:2] != (gh, gw):
        pos = jax.image.resize(pos, (gh, gw, d), method="bilinear")
    t = (t.astype(jnp.float32) + pos[None]).astype(PL.compute_dtype)
    t = t.reshape(t.shape[0], gh * gw, d)
    for j, bp in enumerate(p["blocks"]):
        t = _vit_block(bp, t, heads=max(1, d // 64), policy=PL)
    t = _layer_norm(t, p["enc_ln"]).reshape(t.shape[0], gh, gw, d)
    mp = p["more"]
    e = jax.nn.relu(_layer_norm(_conv(t, mp, 1, PL), mp["ln"]))
    for i, skip in enumerate((skips[2], skips[1], skips[0])):
        e = _upsample2x(e)
        e = jnp.concatenate([e, skip], axis=-1)
        dp = p[f"dec{i}"]
        e = jax.nn.relu(_layer_norm(_conv(e, dp, 1, PL), dp["ln"]))
    # dec3 split open:
    up = _upsample2x(e)
    out["up"] = up
    cv = _conv(up, p["dec3"], 1, PL)
    out["cv"] = cv
    cvf = cv.astype(jnp.float32)
    mu = jnp.mean(cvf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(cvf), axis=-1, keepdims=True) - jnp.square(mu)
    out["var_min"] = jnp.min(var)
    ln = _layer_norm(cv, p["dec3"]["ln"])
    out["ln"] = ln
    e = jax.nn.relu(ln)
    glob = _dense(e, p["out"], PL)
    out["glob"] = glob
    return jnp.sum(glob.astype(jnp.float32) ** 2), out

@jax.jit
def probe(p, x):
    (loss, out), g = jax.value_and_grad(stages, has_aux=True)(p, x)
    return loss, out

loss, out = probe(params, xx)
print("loss:", float(loss))
for k, v in out.items():
    vf = jnp.asarray(v).astype(jnp.float32)
    print(f"{k:8s} finite={bool(jnp.all(jnp.isfinite(vf)))} min={float(jnp.min(vf)):.6g} max={float(jnp.max(vf)):.6g}")
