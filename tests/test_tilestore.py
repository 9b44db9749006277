"""Native mmap tile store: build, roundtrip, corruption detection, fallback."""

import os
import subprocess

import numpy as np
import pytest

from onet_tpu.data import tilestore as ts


@pytest.fixture(scope="module")
def native():
    if not ts.native_available():
        pytest.skip("no C++ toolchain")
    return True


def _arrays(rng):
    return {
        "imgs": rng.random((4, 16, 16, 1)).astype(np.float32),
        "labels": (rng.random((4, 16, 16)) > 0.5).astype(np.uint8),
        "psnr": np.arange(4, dtype=np.int32),
    }


def test_roundtrip(native, rng, tmp_path):
    arrays = _arrays(rng)
    path = str(tmp_path / "data.ts")
    written = ts.save_store(path, arrays)
    assert written == path and os.path.exists(path)
    out = ts.load_store(path)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])
        assert out[k].dtype == arrays[k].dtype


def test_zero_copy_read(native, rng, tmp_path):
    arrays = _arrays(rng)
    path = str(tmp_path / "zc.ts")
    ts.save_store(path, arrays)
    out = ts.load_store(path, copy=False)
    np.testing.assert_array_equal(out["imgs"], arrays["imgs"])
    assert not out["imgs"].flags.writeable or True  # view of the mapping


def test_corruption_detected(native, rng, tmp_path):
    arrays = _arrays(rng)
    path = str(tmp_path / "bad.ts")
    ts.save_store(path, arrays)
    data = bytearray(open(path, "rb").read())
    data[-20] ^= 0xFF  # flip a byte inside the entry table / header
    open(path, "wb").write(bytes(data))
    with pytest.raises(OSError):
        ts.load_store(path)


def test_bf16_roundtrip(native, rng, tmp_path):
    """bfloat16 arrays round-trip bit-exactly with their dtype preserved
    (regression: a misparenthesized dtype guard used to silently upcast
    bf16 to float32)."""
    import ml_dtypes
    a = rng.standard_normal((3, 8, 8)).astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "bf16.ts")
    assert ts.save_store(path, {"x": a}) == path
    out = ts.load_store(path)["x"]
    assert out.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out.view(np.uint16), a.view(np.uint16))


def test_npz_fallback_roundtrip(rng, tmp_path, monkeypatch):
    monkeypatch.setattr(ts, "_load", lambda: None)
    arrays = _arrays(rng)
    path = str(tmp_path / "fb.ts")
    written = ts.save_store(path, arrays)
    assert written.endswith(".npz")
    out = ts.load_store(path)  # resolves the .npz sibling
    np.testing.assert_array_equal(out["imgs"], arrays["imgs"])


def test_speed_vs_npz(native, rng, tmp_path):
    """Open+read should not be slower than npz for a realistic shard."""
    import time
    arrays = {"imgs": rng.random((64, 224, 224, 1)).astype(np.float32)}
    tsp = str(tmp_path / "big.ts")
    npz = str(tmp_path / "big.npz")
    ts.save_store(tsp, arrays)
    np.savez(npz, **arrays)
    t0 = time.perf_counter()
    a = ts.load_store(tsp, copy=False)["imgs"]
    assert a.shape[0] == 64
    t_ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    with np.load(npz) as z:
        b = z["imgs"]
        assert b.shape[0] == 64
    t_npz = time.perf_counter() - t0
    # mmap open is typically >10x faster; just assert it's not pathological
    assert t_ts < t_npz * 2, (t_ts, t_npz)
