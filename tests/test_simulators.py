"""Statistical validation of the device-side clutter simulators — the same
kind of checks the reference prints at generation time (achieved SNR vs
requested, distribution fits)."""

import numpy as np
import pytest
import scipy.special as ss
import scipy.stats as st

import jax
import jax.numpy as jnp

from onet_tpu.sim.kdist import gammaincinv, mnlt, solve_gaussian_acf, acf_poly_coeffs
from onet_tpu.sim.rayleigh import rayleigh_frames, center_crop
from onet_tpu.metrics import psnr_snr


def test_gammaincinv_vs_scipy():
    p = np.linspace(1e-5, 1 - 1e-5, 101).astype(np.float32)
    for a in (0.5, 1.99, 5.0, 20.0):
        got = np.asarray(gammaincinv(a, jnp.asarray(p)))
        want = ss.gammaincinv(a, p.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_mnlt_produces_gamma_marginal(rng):
    x = jnp.asarray(rng.normal(size=50_000).astype(np.float32))
    y = np.asarray(mnlt(x, 5.0))
    assert np.all(np.isfinite(y)) and np.all(y >= 0)
    # moments of Gamma(shape=5, scale=1)
    assert abs(y.mean() - 5.0) < 0.15
    assert abs(y.var() - 5.0) < 0.5


def test_quadratic_root_matches_np_roots(rng):
    """Our closed-form root pick vs np.roots()[0] on the real ACF regime."""
    size = 64
    xs = np.linspace(10, size, size)
    gs = xs[None, :] + xs[:, None]
    gamma_acf = 1 + np.exp(-gs / 10) * np.cos(np.pi * xs[:, None] / 8) / 5.0
    gwn = rng.normal(size=(size, size)).astype(np.float32)
    coeffs = np.asarray(acf_poly_coeffs(jnp.asarray(gwn), mnlt(jnp.asarray(gwn), 5.0)))
    coeffs = coeffs / coeffs[-1]
    got = np.asarray(solve_gaussian_acf(jnp.asarray(gamma_acf), jnp.asarray(coeffs)))
    want = np.empty_like(got)
    cc = coeffs.astype(np.float64).copy()
    for i in range(size):
        for j in range(size):
            cc[-1] = coeffs[-1] - gamma_acf[i, j]
            want[i, j] = np.roots(cc)[0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def _measured_psnr(snr, key=7):
    frames, masks = rayleigh_frames(jax.random.key(key), float(snr),
                                    n_frames=6, frame_size=200, crop=128)
    frames, masks = np.asarray(frames), np.asarray(masks)
    assert frames.shape == (6, 128, 128) and masks.shape == (6, 128, 128)
    assert frames.min() >= 0 and frames.max() <= 1
    frac = masks.mean()
    assert 0.005 < frac < 0.5, f"mask fraction {frac} implausible"
    psnrs = [float(psnr_snr(jnp.asarray(f), jnp.asarray(m))[0])
             for f, m in zip(frames, masks) if m.sum() > 0]
    assert len(psnrs) >= 4
    return float(np.mean(psnrs))


def test_rayleigh_frames_snr_calibration():
    """Measured peak-SNR tracks the request monotonically with the positive
    offset the reference documents ("actual snr is about set_snr*2",
    Rayleigh_bg_..._20230208.py:153): foreground is ADDED where it exceeds
    clutter, so the realized peak rides on top of the background."""
    measured = {snr: _measured_psnr(snr) for snr in (0, 5, 10)}
    assert measured[0] < measured[5] < measured[10]
    for snr, m in measured.items():
        assert snr - 1.0 < m < snr + 12.0, f"requested {snr} dB, measured {m:.1f}"


def test_rayleigh_background_distribution():
    # without targets the background is Rayleigh(1): check via KS on a crop
    key = jax.random.key(3)
    bg = np.asarray(jax.random.rayleigh(key, 1.0, shape=(20000,), dtype=jnp.float32))
    d, p = st.kstest(bg, "rayleigh")
    assert p > 0.01


def test_center_crop_matches_torchvision_semantics():
    x = jnp.arange(5 * 6, dtype=jnp.float32).reshape(5, 6)
    y = np.asarray(center_crop(x, 4))
    # torchvision CenterCrop: top = (5-4)//2 = 0, left = (6-4)//2 = 1
    np.testing.assert_array_equal(y, np.asarray(x)[0:4, 1:5])


def test_kdist_frames_end_to_end():
    from onet_tpu.sim.kdist import KDistSimulator, kdist_frames
    sim = KDistSimulator(jax.random.key(11), size=128, gamma_shape=5.0)
    # texture field should be positive, finite Gamma-like samples
    amp, gan = sim.frame(jax.random.key(1))
    amp, gan = np.asarray(amp), np.asarray(gan)
    assert np.all(np.isfinite(amp)) and np.all(np.isfinite(gan))
    assert np.all(gan >= 0)
    # K-distributed amplitude is heavier-tailed than Rayleigh of equal power
    kurt = st.kurtosis(amp.ravel() ** 2)
    assert kurt > 3.0, f"intensity kurtosis {kurt} not heavy-tailed"
    frames, masks = kdist_frames(jax.random.key(2), 5.0, n_frames=2,
                                 size=128, crop=96, sim=sim)
    assert frames.shape == (2, 96, 96)
    assert float(jnp.max(masks)) == 1.0
