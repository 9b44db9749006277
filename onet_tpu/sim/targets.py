"""Device-side placement of Gaussian extended targets on clutter.

Re-design of the reference's host-side sequential placement
(Rayleigh_bg_Gaussian_EOT_generator_20230208.py:28-175) for TPU:

* every target is rendered over the FULL frame with a box mask computed
  from broadcasted iotas (no dynamic-shape kernel crops — XLA needs static
  shapes), then merged;
* targets still compose sequentially — a later target sees clutter already
  raised by earlier ones, exactly like the reference's in-place loop — via
  ``lax.scan`` over the target axis;
* frames vectorize with ``vmap``; PSNR levels are a static python loop.

Faithful semantics (all cited to the reference):
* sigma = (extent/2 - 0.5)/2; kernel half-width int(sigma*2.5 + 0.5) (:36-37,70-71)
* rotated anisotropic Gaussian, theta negated, peak 1 (unnormalized) (:43-60,73)
* box anchored at int(c - (size-1)/2) (:77-80)
* amplitude kcoef_peak = sqrt(10^(snr/10) * erc) where erc is the clean
  full-frame mean clutter energy (:89,94) — Swerling 0; Swerling 1/3
  amplitude fluctuation draws the mean of 1000 Rayleigh / chi2 samples
  (:98-109)
* foreground adds only where template exceeds current clutter (:156-158)
* mask = kgauss > max - 2*std over the box, accumulated with OR (:155,166-167)
* the theta ~ U(0,180) values are used directly as *radians* (:204,237 pass
  degrees-range values into cos/sin) — reproduced as-is.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def rayleigh_sample(key, shape, dtype=jnp.float32):
    """Rayleigh(scale=1) via inverse CDF on an open uniform.

    jax.random.rayleigh produces inf on the TPU backend when the underlying
    uniform hits an endpoint (observed ~4% of 400^2 fields); clamping the
    uniform to [tiny, 1) bounds the amplitude at sqrt(-2 ln tiny) ~= 13.2.
    """
    u = jax.random.uniform(key, shape, dtype,
                           minval=1.1754944e-38, maxval=1.0)
    return jnp.sqrt(-2.0 * jnp.log(u))


def _rotated_gauss_coeffs(sigma_x, sigma_y, theta):
    th = -theta
    a = jnp.cos(th) ** 2 / (2 * sigma_x ** 2) + jnp.sin(th) ** 2 / (2 * sigma_y ** 2)
    b = -jnp.sin(2 * th) / (4 * sigma_x ** 2) + jnp.sin(2 * th) / (4 * sigma_y ** 2)
    c = jnp.sin(th) ** 2 / (2 * sigma_x ** 2) + jnp.cos(th) ** 2 / (2 * sigma_y ** 2)
    return a, b, c


def _place_one(carry, tgt, *, rows, cols, snr_lin):
    """Scan body: render one target into the running (clutter, mask)."""
    bg, mask, erc = carry
    cx, cy, w, h, theta, amp_jitter = tgt

    # clamp: a tail draw of w/h near 1 gives sigma -> 0, whose inf
    # coefficient times the zero center offset is NaN (the reference would
    # crash on such draws too — "kernel too small" guard at :39-41)
    sigma_x = jnp.maximum((w / 2 - 0.5) / 2, 0.25)
    sigma_y = jnp.maximum((h / 2 - 0.5) / 2, 0.25)
    wr = jnp.floor(sigma_x * 2.5 + 0.5).astype(jnp.int32)
    hr = jnp.floor(sigma_y * 2.5 + 0.5).astype(jnp.int32)
    img_h, img_w = bg.shape
    # clamp centers so the kernel box stays inside the frame (the reference
    # raises on out-of-bounds; with centers ~N(mid, 30) this never fires)
    cxi = jnp.clip(jnp.floor(cx).astype(jnp.int32), wr, img_w - wr - 1)
    cyi = jnp.clip(jnp.floor(cy).astype(jnp.int32), hr, img_h - hr - 1)

    kx = (cols - cxi).astype(jnp.float32)
    ky = (rows - cyi).astype(jnp.float32)
    inbox = (jnp.abs(cols - cxi) <= wr) & (jnp.abs(rows - cyi) <= hr)

    a, b, c = _rotated_gauss_coeffs(sigma_x, sigma_y, theta)
    kgauss = jnp.exp(-(a * kx ** 2 + 2 * b * kx * ky + c * ky ** 2))
    kgauss = jnp.where(inbox, kgauss, 0.0)

    box_n = ((2 * wr + 1) * (2 * hr + 1)).astype(jnp.float32)
    kmean = jnp.sum(kgauss) / box_n
    kstd = jnp.sqrt(jnp.maximum(jnp.sum(kgauss ** 2) / box_n - kmean ** 2, 0.0))

    kcoef = jnp.sqrt(snr_lin * erc) * amp_jitter     # peak-point SNR calibration
    template = kgauss * kcoef

    fg = jnp.where(inbox & (template > bg), template, 0.0)
    bg = bg + fg
    tmask = inbox & (kgauss > (1.0 - 2.0 * kstd))    # unnormalized peak == 1
    mask = mask | tmask
    return (bg, mask, erc), None


def place_gaussian_targets(key, clutter, snr_db, *, n_targets: int = 20,
                           swerling: int = 0,
                           center_std=(30.0, 24.0), extent_mean=(10.0, 18.0),
                           extent_std=(2.0, 2.0)):
    """Add ``n_targets`` Gaussian extended targets to one clutter frame.

    Returns (frame, fg_mask). ``clutter``: [H, W] float32; snr_db: python
    or traced scalar.
    """
    img_h, img_w = clutter.shape
    kc, kw, kh, kt, ka = jax.random.split(key, 5)
    cx = img_w / 2 + center_std[0] * jax.random.normal(kc, (n_targets,))
    cy = img_h / 2 + center_std[1] * jax.random.normal(jax.random.fold_in(kc, 1), (n_targets,))
    w = extent_mean[0] + extent_std[0] * jax.random.normal(kw, (n_targets,))
    h = extent_mean[1] + extent_std[1] * jax.random.normal(kh, (n_targets,))
    theta = jax.random.uniform(kt, (n_targets,)) * 180.0  # used as radians (sic)

    if swerling == 0:
        amp = jnp.ones((n_targets,))
    elif swerling == 1:
        # mean of 1000 Rayleigh(scale = kcoef/sqrt(2)) draws, relative to kcoef
        draws = rayleigh_sample(ka, (n_targets, 1000)) / math.sqrt(2.0)
        amp = jnp.mean(draws, axis=1)
    elif swerling == 3:
        df = 4.0
        scale = 1.0 / math.sqrt(df * 2 + df ** 2)
        draws = scale * 2.0 * jax.random.gamma(ka, df / 2.0, (n_targets, 1000))
        amp = jnp.mean(draws, axis=1)
    else:
        raise ValueError(f"unsupported swerling type {swerling}")

    erc = jnp.mean(jnp.square(clutter))
    rows = lax.broadcasted_iota(jnp.int32, (img_h, img_w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (img_h, img_w), 1)
    snr_lin = jnp.power(10.0, jnp.asarray(snr_db, jnp.float32) / 10.0)

    body = partial(_place_one, rows=rows, cols=cols, snr_lin=snr_lin)
    init = (clutter, jnp.zeros(clutter.shape, jnp.bool_), erc)
    (frame, mask, _), _ = lax.scan(body, init,
                                   (cx, cy, w, h, theta, amp))
    return frame, mask.astype(jnp.float32)
