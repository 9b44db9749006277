"""Correlated K-distributed sea-clutter simulator, device-side.

Re-design of K_distributed_SeaClutter_Simulation_20210919.py for TPU:

pipeline (Brekke IJOE-2010 section IV, as in the reference):
  1. gamma-texture ACF  R_T(x,y) = 1 + exp(-(x+y)/10) cos(pi y / 8)/v
     (:489, eq.69 of Tough-JPD-1999),
  2. Hermite-expansion coefficients of the Gaussian<->Gamma ACF relation
     from a white-noise sample (coeff_acf_polyn, :121-139; orders 2..0),
  3. per-pixel quadratic solve for the Gaussian ACF (solve_acf_polyn,
     :141-164). The reference calls np.roots per pixel (90k calls, the
     dominant setup cost); we use the closed-form quadratic and pick the
     larger-magnitude root — np.roots' leading eigenvalue for this regime
     (validated in tests) — fully vectorized, ~1e4x faster,
  4. FFT-color a white field by sqrt(F[gaussian ACF]) (:499-502),
  5. MNLT map through the Gamma quantile: y = gammaincinv(v, ndtr(x))
     (:83-91). JAX has no gammaincinv; we invert jax.scipy.special.gammainc
     with a Wilson-Hilferty seed + Newton iterations (static count, fp32),
  6. multiply by correlated complex-Gaussian speckle with power-law PSD
     f^-0.6 (:270-297) and take the amplitude (:516-520).

The reference's "fast" path crashes on a missing ``size`` argument
(:457,567 — SURVEY.md section 2.2); here the speckle generator always
receives the field size.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from onet_tpu.ops.normalize import minmax_per_array
from onet_tpu.sim.targets import place_gaussian_targets
from onet_tpu.sim.rayleigh import center_crop


# ---------------------------------------------------------------------------
# device-side inverse regularized lower incomplete gamma
# ---------------------------------------------------------------------------

def gammaincinv(a, p, *, n_newton: int = 20):
    """Solve P(a, y) = p for y >= 0 (regularized lower incomplete gamma).

    Seed: Wilson-Hilferty normal approximation in the bulk, the
    small-argument asymptotic y ~= (p * Gamma(a+1))^(1/a) in the left tail
    (where WH collapses for small shapes); then damped Newton in float32.
    ``a`` is a python float (static); ``p`` an array in (0, 1).
    """
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    z = jsp.ndtri(p)
    c = 1.0 / (9.0 * a)
    y_wh = a * (1.0 - c + z * jnp.sqrt(c)) ** 3
    log_gamma_a = math.lgamma(a)
    # left-tail asymptotic: P(a,y) ~ y^a / (a Gamma(a)) for y -> 0
    y_small = jnp.exp((jnp.log(p) + math.log(a) + log_gamma_a) / a)
    y = jnp.where(y_small < 0.6 * (a + 1.0), y_small, jnp.maximum(y_wh, 1e-6))
    y = jnp.maximum(y, 1e-30)

    def newton(y, _):
        f = jsp.gammainc(a, y) - p
        # P'(a, y) = y^(a-1) e^-y / Gamma(a)
        logpdf = (a - 1.0) * jnp.log(y) - y - log_gamma_a
        step = f * jnp.exp(-logpdf)
        step = jnp.clip(step, -0.9 * y, 0.9 * y)  # damped: keep y positive
        return jnp.maximum(y - step, 1e-30), None

    y, _ = jax.lax.scan(newton, y, None, length=n_newton)
    return y


def mnlt(x, v: float):
    """Memoryless nonlinear transform: Gaussian sample -> Gamma sample.

    y = gammaincinv(v, 1 - erfc(x/sqrt(2))/2) == gammaincinv(v, ndtr(x))
    (reference :83-91).
    """
    return gammaincinv(v, jsp.ndtr(x))


# ---------------------------------------------------------------------------
# ACF machinery
# ---------------------------------------------------------------------------

def _hermite(x, n: int):
    if n == 0:
        return jnp.ones_like(x)
    if n == 1:
        return 2 * x
    if n == 2:
        return 4 * x ** 2 - 2
    raise ValueError(n)


def acf_poly_coeffs(x, gamma_q):
    """Hermite-expansion coefficients [a2, a1, a0] (reference :121-139)."""
    coeffs = []
    for n in (2, 1, 0):
        factor = 1.0 / (math.pi * math.factorial(n) * 2 ** n)
        s = jnp.sum(jnp.exp(-x ** 2) * _hermite(x, n) * gamma_q)
        coeffs.append(factor * s ** 2)
    return jnp.stack(coeffs)


def solve_gaussian_acf(gamma_acf, coeffs):
    """Per-pixel larger-magnitude root of a2 y^2 + a1 y + (a0 - R_T) = 0.

    Matches np.roots(...)[0] on this coefficient regime (tested); complex
    discriminants follow numpy's scimath sqrt (principal branch).
    """
    a2, a1, a0 = coeffs[0], coeffs[1], coeffs[2]
    c = (a0 - gamma_acf).astype(jnp.complex64)
    disc = jnp.sqrt((a1 ** 2).astype(jnp.complex64) - 4 * a2 * c)
    r1 = (-a1 + disc) / (2 * a2)
    r2 = (-a1 - disc) / (2 * a2)
    return jnp.where(jnp.abs(r1) >= jnp.abs(r2), r1, r2)


def correlated_gaussian_expdecay(key, size: int):
    """Complex speckle field with power-law PSD f^-0.6 (reference :270-297)."""
    fs = size / 10.0
    gwn = jax.random.normal(key, (size, size), jnp.float32)
    f_gw = jnp.fft.fft2(gwn)
    fx = jnp.linspace(0.1, fs, size)
    dfs = jnp.sqrt(fx[None, :] ** 2 + fx[:, None] ** 2)
    f_rc = dfs ** -0.6
    return jnp.fft.ifft2(f_gw * jnp.sqrt(f_rc).astype(jnp.complex64))


class KDistSimulator:
    """Caches the solved Gaussian ACF for a frame shape (reference KField,
    :528-574) and generates frames with the fast FFT path."""

    def __init__(self, key, size: int = 400, gamma_shape: float = 5.0):
        self.size = size
        self.v = float(gamma_shape)

        @partial(jax.jit, static_argnames=("n", "v"))
        def _setup(key, n: int, v: float):
            xs = jnp.linspace(10.0, n, n)
            grid_sum = xs[None, :] + xs[:, None]      # XS + YS
            ys = xs[:, None]
            gamma_acf = 1.0 + jnp.exp(-grid_sum / 10.0) * jnp.cos(
                jnp.pi * ys / 8.0) / v
            gwn = jax.random.normal(key, (n, n), jnp.float32)
            coeffs = acf_poly_coeffs(gwn, mnlt(gwn, v))
            coeffs = coeffs / coeffs[-1]
            gaussian_acf = solve_gaussian_acf(gamma_acf, coeffs)
            return gamma_acf, gaussian_acf, jnp.sqrt(jnp.fft.fft2(gaussian_acf))

        self.gamma_acf, self.gaussian_acf, self.f_acf_sqrt = _setup(
            key, size, self.v)

    def frame_from_acf(self, key, f_acf_sqrt):
        """One K-distributed amplitude frame + its Gamma texture, with the
        cached spectral ACF passed explicitly (jit-argument friendly)."""
        k1, k2 = jax.random.split(key)
        gwn = jax.random.normal(k1, (self.size, self.size), jnp.float32)
        f_gw = jnp.fft.fft2(gwn)
        gcn = jnp.real(jnp.fft.ifft2(f_gw * f_acf_sqrt))
        gan = mnlt(gcn, self.v)
        speckle = correlated_gaussian_expdecay(k2, self.size)
        return jnp.abs(speckle * jnp.sqrt(gan).astype(jnp.complex64)), gan

    def frame(self, key):
        """One K-distributed amplitude frame + its Gamma texture."""
        return self.frame_from_acf(key, self.f_acf_sqrt)


def kdist_frames(key, snr_db, *, n_frames: int, size: int = 400,
                 crop: int = 224, gamma_shape: float = 5.0,
                 n_targets: int = 20, swerling: int = 0, sim: KDistSimulator = None):
    """K-clutter frames with Gaussian EOTs (reference get_k_frame :177-216)."""
    sim = sim or KDistSimulator(jax.random.fold_in(key, 999), size, gamma_shape)

    # NOTE: the cached complex ACF is threaded as an argument (not a closed-
    # over constant): embedding complex64 constants requires a device->host
    # transfer the axon TPU backend does not implement.
    @partial(jax.jit, static_argnames=())
    def one(k, f_acf_sqrt):
        kb, kt = jax.random.split(k)
        bg, _ = sim.frame_from_acf(kb, f_acf_sqrt)
        frame, mask = place_gaussian_targets(kt, bg.astype(jnp.float32), snr_db,
                                             n_targets=n_targets, swerling=swerling)
        return minmax_per_array(frame), mask

    frames, masks = jax.vmap(one, in_axes=(0, None))(
        jax.random.split(key, n_frames), sim.f_acf_sqrt)
    return center_crop(frames, crop), center_crop(masks, crop)
