"""Probe: can Winograd F(2x2,3x3) beat the direct 3x3 conv on v5e?

Winograd is the only route BELOW the direct-conv FLOP count that SOL.md's
ceiling is derived from: F(2x2,3x3) computes 16 multiplies per 2x2 output
tile instead of 36 (0.444x MXU work). The catch on TPU is data movement —
the transformed tensor V is 4x the input bytes, so an unfused (pure-XLA)
formulation trades a 2.25x FLOP cut for ~9x HBM traffic on the transform
chain. This probe measures that trade at EVERY distinct 3x3-conv shape of
the train graph (reference workload Onet_vanilla_20240606.py:104-153,
shapes as lowered by models/layers.py): if even one high-intensity deep
shape wins at the XLA level, a Pallas fused version (transforms resident
in VMEM) is worth writing; if all lose by more than the fusion could
recover (per the measured ~12us/block Mosaic overhead from the
pair-packing study), the Winograd route is measured-closed too.

    PYTHONPATH=.:$PYTHONPATH python runs/winograd_probe.py
    (append, don't replace: the axon TPU plugin registers via the
    PYTHONPATH sitecustomize)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onet_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

ITERS = 20
DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015). B^T/A^T entries are
# 0/+-1 so V/Y build as shifted-slice adds; G carries the only fractions.
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)

# every distinct (B, H, cin, cout) 3x3-conv shape in the b=8 train graph
# (512^2 levels channel-stacked, deeper levels batch-stacked; RESULTS.md
# int8 sweep used the same list)
SHAPES = [
    (8, 512, 128, 128),
    (8, 512, 256, 128),
    (8, 256, 128, 256),
    (16, 256, 128, 128),
    (16, 256, 256, 128),
    (16, 128, 128, 256),
    (16, 128, 256, 256),
    (16, 128, 512, 256),
    (16, 64, 256, 512),
    (16, 64, 512, 512),
    (16, 64, 1024, 512),
    (16, 32, 512, 1024),
    (16, 32, 1024, 1024),
]


def transform_weights(w):
    """w [3,3,Cin,Cout] -> U [16, Cin, Cout] = (G g G^T) per channel pair."""
    u = jnp.einsum("ai,ijco,bj->abco", G, w.astype(jnp.float32), G)
    return u.reshape(16, w.shape[2], w.shape[3]).astype(w.dtype)


def winograd_conv(x, u):
    """SAME 3x3 conv via F(2x2,3x3). x [N,H,W,C] (H,W even), u [16,C,K]."""
    n, h, w, c = x.shape
    th, tw = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[i][j] = overlapping 4x4 tiles at stride 2: [N, Th, Tw, C]
    d = [[lax.slice(xp, (0, i, j, 0),
                    (n, i + 2 * th - 1, j + 2 * tw - 1, c),
                    (1, 2, 2, 1)) for j in range(4)] for i in range(4)]
    # V[a,b] = sum_ij BT[a,i] BT[b,j] d[i][j]  (coefficients are 0/+-1)
    rows = []
    for i in range(4):
        r0 = d[i][0] - d[i][2]
        r1 = d[i][1] + d[i][2]
        r2 = d[i][2] - d[i][1]
        r3 = d[i][1] - d[i][3]
        rows.append((r0, r1, r2, r3))
    v = []
    for b in range(4):
        c0 = rows[0][b] - rows[2][b]
        c1 = rows[1][b] + rows[2][b]
        c2 = rows[2][b] - rows[1][b]
        c3 = rows[1][b] - rows[3][b]
        v.extend([c0, c1, c2, c3])  # index a*4+b with a fastest? fix below
    # v list built column-major: reorder to a*4+b
    v = [v[b * 4 + a] for a in range(4) for b in range(4)]
    vst = jnp.stack([t.reshape(n * th * tw, c) for t in v])     # [16, P, C]
    m = lax.dot_general(vst, u, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)      # [16, P, K]
    k = u.shape[2]
    m = m.reshape(4, 4, n, th, tw, k)
    # Y[p,q] = sum_ab AT[p,a] AT[q,b] M[a,b]
    ra = [m[0] + m[1] + m[2], m[1] - m[2] - m[3]]                # over a
    y = [[ra[p][0] + ra[p][1] + ra[p][2],
          ra[p][1] - ra[p][2] - ra[p][3]] for p in range(2)]     # over b
    yt = jnp.stack([jnp.stack(y[0], 0), jnp.stack(y[1], 0)], 0)  # [2,2,N,Th,Tw,K]
    out = yt.transpose(2, 3, 0, 4, 1, 5).reshape(n, h, w, k)
    return out.astype(x.dtype)


def _sync(y):
    float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))


def timeit(fn, *args):
    y = fn(*args)
    _sync(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = fn(*args)
        _sync(y)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    conv = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN))
    wino = jax.jit(winograd_conv)

    print(f"{'shape (B,H^2,cin->cout)':28s} {'direct':>10s} {'winograd':>10s}"
          f" {'ratio':>7s} {'max|err|':>9s}")
    total_d = total_w = 0.0
    for (b, h, cin, cout) in SHAPES:
        kx, kw = jax.random.split(jax.random.key(b * h + cin))
        x = jax.jit(lambda k: jax.random.normal(
            k, (b, h, h, cin), jnp.bfloat16))(kx)
        w = jax.jit(lambda k: 0.05 * jax.random.normal(
            k, (3, 3, cin, cout), jnp.bfloat16))(kw)
        u = jax.jit(transform_weights)(w)
        y_d = conv(x, w)
        y_w = wino(x, u)
        err = float(jnp.max(jnp.abs(y_d.astype(jnp.float32) -
                                    y_w.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_d.astype(jnp.float32)))) + 1e-9
        t_d = timeit(conv, x, w)
        t_w = timeit(wino, x, u)
        total_d += t_d
        total_w += t_w
        print(f"{b:3d},{h:4d}^2,{cin:5d}->{cout:5d}      "
              f"{t_d*1e3:8.3f}ms {t_w*1e3:8.3f}ms {t_w/t_d:6.2f}x"
              f" {err/scale:8.1e}")
    print(f"{'TOTAL':28s} {total_d*1e3:8.3f}ms {total_w*1e3:8.3f}ms"
          f" {total_w/total_d:6.2f}x")


if __name__ == "__main__":
    main()
