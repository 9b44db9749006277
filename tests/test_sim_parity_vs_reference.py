"""Statistical parity of the device-side Rayleigh simulator against the
REFERENCE numpy generator (imported read-only from /root/reference when
present; skipped elsewhere). Protocol: whole-frame normalize, center-crop
224, compare mask fraction and achieved peak-PSNR distributions."""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/source_code"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def ref_module():
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.CenterCrop = lambda sz: (lambda x: x)
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    sys.path.insert(0, REF)
    with contextlib.redirect_stdout(io.StringIO()):
        import Rayleigh_bg_Gaussian_EOT_generator_20230208 as R
    return R


def _stats_ref(R, snr, n=4):
    np.random.seed(1981 + snr)
    fracs, peaks = [], []
    for _ in range(n):
        with contextlib.redirect_stdout(io.StringIO()):
            frame, mask = R.get_rayleigh_frame(snr)
        fr = (frame - frame.min()) / (frame.max() - frame.min() + np.spacing(1))
        t = (400 - 224) // 2
        frc = fr[t:t + 224, t:t + 224]
        mc = mask[t:t + 224, t:t + 224] > 0
        fracs.append(mc.mean())
        tgt = frc * mc
        erc = ((frc - tgt) ** 2).sum() / (frc.size - mc.sum())
        peaks.append(10 * np.log10(tgt.max() ** 2 / erc))
    return np.mean(fracs), np.mean(peaks)


def _stats_ours(snr, n=4):
    from onet_tpu.sim.rayleigh import rayleigh_frames
    from onet_tpu.metrics import psnr_snr

    frames, masks = rayleigh_frames(jax.random.key(42 + snr), float(snr),
                                    n_frames=n)
    frames, masks = np.asarray(frames), np.asarray(masks)
    peaks = [float(psnr_snr(jnp.asarray(f), jnp.asarray(m))[0])
             for f, m in zip(frames, masks)]
    return masks.mean(), np.mean(peaks)


@pytest.mark.parametrize("snr", [0, 10])
def test_rayleigh_sim_matches_reference_statistics(ref_module, snr):
    f_ref, p_ref = _stats_ref(ref_module, snr)
    f_our, p_our = _stats_ours(snr)
    assert abs(f_our - f_ref) < 0.006, (f_our, f_ref)
    assert abs(p_our - p_ref) < 1.5, (p_our, p_ref)
