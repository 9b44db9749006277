"""CA-CFAR baseline segmenter vs a brute-force oracle.

The reference compares Onet against ``CFAR(kval, nref=16, mguide=8)``
(exp_nau_rain_20240513.py:115,208); the CFAR module itself is absent from
the snapshot (SURVEY §2.9), so ``onet_tpu/metrics/cfar.py`` is an
independent standard CA-CFAR. These tests pin it to an O(window²)
brute-force annulus mean, including the clipped borders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from onet_tpu.metrics.cfar import cfar_seg, cfar_seg_batch


def _brute_cfar(img, kval, nref, mguide):
    h, w = img.shape
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            acc, cnt = 0.0, 0
            for dy in range(-nref, nref + 1):
                for dx in range(-nref, nref + 1):
                    yy, xx = y + dy, x + dx
                    if not (0 <= yy < h and 0 <= xx < w):
                        continue
                    if abs(dy) <= mguide and abs(dx) <= mguide:
                        continue
                    acc += img[yy, xx]
                    cnt += 1
            out[y, x] = int(img[y, x] > kval * acc / max(cnt, 1))
    return out


def test_cfar_matches_bruteforce():
    rng = np.random.default_rng(0)
    img = rng.rayleigh(1.0, size=(24, 20)).astype(np.float32)
    got = np.asarray(cfar_seg(jnp.asarray(img), 1.5, nref=5, mguide=2))
    want = _brute_cfar(img, 1.5, 5, 2)
    np.testing.assert_array_equal(got, want)


def test_cfar_detects_bright_target_in_clutter():
    rng = np.random.default_rng(1)
    img = rng.rayleigh(1.0, size=(64, 64)).astype(np.float32)
    img[30:34, 30:34] += 30.0  # strong point target
    det = np.asarray(cfar_seg(jnp.asarray(img), 3.0))  # reference nref/mguide
    assert det[30:34, 30:34].all()
    # false alarms stay sparse at a high threshold factor
    far = (det.sum() - 16) / (64 * 64 - 16)
    assert far < 0.02, far


def test_cfar_kval_controls_far():
    # higher kval -> fewer detections on pure clutter (monotone sweep)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.rayleigh(1.0, size=(96, 96)).astype(np.float32))
    rates = [float(cfar_seg(img, k, nref=8, mguide=3).mean())
             for k in (1.0, 2.0, 3.0)]
    assert rates[0] > rates[1] > rates[2]


def test_cfar_batch_shapes():
    imgs = jnp.ones((3, 16, 16, 1))
    out = cfar_seg_batch(imgs, 2.0, nref=4, mguide=1)
    assert out.shape == (3, 16, 16) and out.dtype == jnp.int32
    # uniform image: nothing exceeds kval * mean for kval > 1
    assert int(out.sum()) == 0
