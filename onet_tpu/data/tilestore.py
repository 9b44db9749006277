"""Python bindings for the native memory-mapped tile store.

``save_store`` / ``load_store`` persist dicts of numpy/jax arrays through
the C++ mmap store (native/tilestore.cpp): open is O(1) (no pickle
deserialization) and reads are zero-copy views of the mapping. The library
auto-builds on first use when a toolchain is present and degrades to an
npz fallback otherwise, so the API always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np
import ml_dtypes

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtilestore.so"))

_DTYPES = {0: np.float32, 1: np.uint16, 2: np.int32, 3: np.uint8, 4: np.int64,
           5: ml_dtypes.bfloat16}
_DTYPE_IDS = {np.dtype(np.float32): 0, np.dtype(np.uint16): 1,
              np.dtype(np.int32): 2, np.dtype(np.uint8): 3,
              np.dtype(np.int64): 4, np.dtype(ml_dtypes.bfloat16): 5}

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ts_writer_open.restype = ctypes.c_void_p
    lib.ts_writer_open.argtypes = [ctypes.c_char_p]
    lib.ts_writer_add.restype = ctypes.c_int
    lib.ts_writer_add.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64]
    lib.ts_writer_close.restype = ctypes.c_int
    lib.ts_writer_close.argtypes = [ctypes.c_void_p]
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p]
    lib.ts_num_entries.restype = ctypes.c_int
    lib.ts_num_entries.argtypes = [ctypes.c_void_p]
    lib.ts_entry.restype = ctypes.c_void_p
    lib.ts_entry.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64)]
    lib.ts_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def save_store(path: str, arrays: Dict[str, np.ndarray]) -> str:
    """Write a dict of arrays. Returns the actual path written (a .npz
    sibling when the native library is unavailable)."""
    lib = _load()
    if lib is None:
        alt = path + ".npz"
        np.savez(alt, **{k: np.asarray(v) for k, v in arrays.items()})
        return alt
    w = lib.ts_writer_open(path.encode())
    if not w:
        raise OSError(f"cannot open {path} for writing")
    try:
        for name, arr in arrays.items():
            a = np.ascontiguousarray(np.asarray(arr))
            if a.dtype not in _DTYPE_IDS:
                a = a.astype(np.float32)
            shape = (ctypes.c_int64 * a.ndim)(*a.shape)
            rc = lib.ts_writer_add(
                w, name.encode(), _DTYPE_IDS[a.dtype], shape, a.ndim,
                a.ctypes.data_as(ctypes.c_void_p), a.nbytes)
            if rc != 0:
                raise OSError(f"tilestore write failed rc={rc} for {name}")
    finally:
        rc = lib.ts_writer_close(w)
    if rc != 0:
        raise OSError(f"tilestore close failed rc={rc}")
    return path


def load_store(path: str, *, copy: bool = True) -> Dict[str, np.ndarray]:
    """Load a store into a dict. ``copy=False`` returns zero-copy views of
    the mapping (valid for the process lifetime; the mapping is retained)."""
    if path.endswith(".npz") or (not os.path.exists(path)
                                 and os.path.exists(path + ".npz")):
        p = path if path.endswith(".npz") else path + ".npz"
        with np.load(p) as z:
            return {k: z[k] for k in z.files}
    lib = _load()
    if lib is None:
        raise OSError("native tilestore unavailable and no .npz fallback")
    s = lib.ts_open(path.encode())
    if not s:
        raise OSError(f"cannot open/validate tile store {path}")
    out = {}
    keep_mapping = False
    try:
        n = lib.ts_num_entries(s)
        for i in range(n):
            name = ctypes.create_string_buffer(64)
            dtype = ctypes.c_uint32()
            shape = (ctypes.c_int64 * 8)()
            ndim = ctypes.c_uint32()
            nbytes = ctypes.c_uint64()
            ptr = lib.ts_entry(s, i, name, ctypes.byref(dtype), shape,
                               ctypes.byref(ndim), ctypes.byref(nbytes))
            if not ptr:
                raise OSError(f"corrupt entry {i} in {path}")
            shp = tuple(shape[j] for j in range(ndim.value))
            np_dtype = _DTYPES[dtype.value]
            buf = (ctypes.c_char * nbytes.value).from_address(ptr)
            arr = np.frombuffer(buf, dtype=np_dtype).reshape(shp)
            if copy:
                arr = arr.copy()
            else:
                keep_mapping = True
            out[name.value.decode()] = arr
    finally:
        if not keep_mapping:
            lib.ts_close(s)
        # zero-copy mode intentionally leaks the mapping (process-lifetime)
    return out
