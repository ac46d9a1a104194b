"""ctypes bindings for the native host kernels (native/libhymetio.so).

Build with ``make -C native`` (or :func:`build`). Everything here has a
pure-Python/numpy fallback — callers must go through
:func:`available` / the wrapper functions, never assume the library
exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libhymetio.so")


def build(quiet: bool = True) -> bool:
    """Compile the native library in place. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_SO_PATH)
    except Exception:  # noqa: BLE001
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        if os.environ.get("HYMET_BUILD_NATIVE", "1") == "1":
            build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.hymet_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hymet_encode.restype = None
        lib.hymet_kmer_hashes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.hymet_kmer_hashes.restype = ctypes.c_int64
        lib.hymet_minimizers.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.hymet_minimizers.restype = ctypes.c_int64
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_seq(seq: bytes) -> np.ndarray:
    lib = _load()
    out = np.empty(len(seq), dtype=np.uint8)
    lib.hymet_encode(seq, len(seq), _u8ptr(out))
    return out


def kmer_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    out = np.empty(n - k + 1, dtype=np.uint64)
    n_out = lib.hymet_kmer_hashes(
        _u8ptr(codes), n, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    )
    return out[:n_out]


def minimizers(
    codes: np.ndarray, k: int, w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    n = codes.shape[0]
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    cap = max(n, 1)
    out_h = np.empty(cap, dtype=np.uint64)
    out_pos = np.empty(cap, dtype=np.int32)
    out_strand = np.empty(cap, dtype=np.int8)
    n_out = lib.hymet_minimizers(
        _u8ptr(codes),
        n,
        k,
        w,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out_h[:n_out].copy(), out_pos[:n_out].copy(), out_strand[:n_out].copy()


def read_fasta_codes(path: str) -> Tuple[List[str], List[np.ndarray]]:
    from hymet_tpu.io.fasta import iter_fasta

    names: List[str] = []
    codes: List[np.ndarray] = []
    for name, seq in iter_fasta(path):
        names.append(name)
        codes.append(encode_seq(seq))
    return names, codes
