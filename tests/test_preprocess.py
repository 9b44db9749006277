"""Preprocessing parity vs cv2 / PIL oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from onet_tpu.preprocess import (
    dark_channel, atm_light, transmission_estimate, guided_filter,
    transmission_refine, recover, dehaze,
    equalize_uint8, contrast_enhance, apply_pre_option, PRE_OPTIONS,
)


@pytest.fixture
def im(rng):
    # >= 2000 px so atm_light's top-0.1% set has numpx >= 2 — the
    # reference's operating regime (224^2 thumbnails -> numpx=50). Below
    # 2000 px the reference's skip-the-first loop leaves a == 0 and its
    # pipeline emits NaN; ours clamps (see test_tiny_image_is_finite).
    return rng.uniform(0, 1, (50, 50, 3)).astype(np.float32)


def cv2_pipeline(im, sz=3, radius=3, eps=1e-4, tx=0.3):
    import cv2
    dc = np.min(im, axis=2)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (sz, sz))
    dark = cv2.erode(dc, kernel)
    h, w = dark.shape
    numpx = max((h * w) // 1000, 1)
    idx = dark.reshape(-1).argsort()[h * w - numpx:]
    atm = np.zeros((3,))
    for ind in range(1, numpx):
        atm += im.reshape(-1, 3)[idx[ind]]
    a = atm / numpx
    im3 = im / a[None, None, :]
    dc3 = np.min(im3, axis=2)
    te = 1 - 0.95 * cv2.erode(dc3.astype(np.float32), kernel)
    gray = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)

    def box(x):
        return cv2.boxFilter(x.astype(np.float64), cv2.CV_64F, (radius, radius))

    mi, mp = box(gray), box(te)
    mip = box(gray * te)
    cov = mip - mi * mp
    var = box(gray * gray) - mi * mi
    aa = cov / (var + eps)
    bb = mp - aa * mi
    t = box(aa) * gray + box(bb)
    tt = np.maximum(t, tx)
    j = (im - a[None, None, :]) / tt[..., None] + a[None, None, :]
    k = a.max() * (1 - t)
    return dark, a, te, t, j, k


def test_dark_channel_matches_cv2(im):
    dark_ref, *_ = cv2_pipeline(im)
    got = np.asarray(dark_channel(jnp.asarray(im), 3))
    np.testing.assert_allclose(got, dark_ref, atol=1e-6)


def test_full_dehaze_matches_cv2(im):
    _, a_ref, _, t_ref, j_ref, k_ref = cv2_pipeline(im)
    j, k = dehaze(jnp.asarray(im))
    np.testing.assert_allclose(np.asarray(atm_light(jnp.asarray(im),
                                                    dark_channel(jnp.asarray(im), 3))),
                               a_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=2e-3)


def test_equalize_matches_pil(rng):
    from PIL import Image, ImageOps
    u8 = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    want = np.asarray(ImageOps.equalize(Image.fromarray(u8)))
    got = equalize_uint8(u8)
    np.testing.assert_array_equal(got, want)


def test_contrast_matches_pil(rng):
    from PIL import Image, ImageEnhance
    u8 = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    want = np.asarray(ImageEnhance.Contrast(Image.fromarray(u8)).enhance(0.5))
    got = contrast_enhance(u8, 0.5)
    # PIL blends in integer space; allow off-by-one from rounding
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_all_pre_options_run(rng):
    u8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    for opt in PRE_OPTIONS:
        out = apply_pre_option(u8, opt)
        assert out.shape == (64, 64, 3) and out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0


def test_tiny_image_dehaze_is_finite(rng):
    """Documented divergence from the reference: on images < 2000 px the
    reference's atm-light loop (`for ind in range(1, numpx)`) leaves
    a == 0 and the division cascades NaN through the whole pipeline; our
    transmission_estimate clamps a (inert for any real thumbnail) so
    every preprocessing option stays finite (preprocess/haze.py)."""
    u8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    for o in PRE_OPTIONS:
        out = apply_pre_option(u8, o)
        assert np.isfinite(out).all(), o
