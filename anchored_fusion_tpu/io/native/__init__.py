"""Loader for the native sequence codec.

Compiles ``codec.c`` once with the system compiler into a per-user cache
directory and binds it via ctypes (the environment has no pybind11; ctypes
over a C ABI keeps the binding dependency-free).  All entry points degrade to
the pure-Python implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "codec.c")
_lib = None
_tried = False


def _build() -> Optional[str]:
    src = open(_SRC, "rb").read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.environ.get("AFT_NATIVE_CACHE",
                           os.path.expanduser("~/.cache/aft_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"codec_{tag}.so")
    if os.path.exists(so):
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", _SRC, "-o", so + ".tmp"],
                           check=True, capture_output=True)
            os.replace(so + ".tmp", so)
            return so
        except Exception:
            continue
    return None


def get_lib():
    """The loaded codec library, or None when native support is unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.aft_encode_dna.restype = ctypes.c_long
        lib.aft_encode_dna.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p]
        lib.aft_decode_fastq.restype = ctypes.c_long
        lib.aft_decode_fastq.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        lib.aft_fastq_max_len.restype = ctypes.c_long
        lib.aft_fastq_max_len.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.aft_fastq_count.restype = ctypes.c_long
        lib.aft_fastq_count.argtypes = [ctypes.c_char_p, ctypes.c_long]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def decode_fastq_native(data: bytes, max_len: Optional[int] = None
                        ) -> Optional[Tuple[list, np.ndarray, np.ndarray]]:
    """(names, seq (N, L) int8 PAD-padded, lengths (N,)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = int(lib.aft_fastq_count(data, len(data)))
    if n == 0:
        return [], np.zeros((0, max_len or 8), np.int8), np.zeros(0, np.int32)
    if max_len is None:
        longest = int(lib.aft_fastq_max_len(data, len(data)))
        max_len = max(8, -(-longest // 128) * 128)
    seq = np.full((n, max_len), 5, np.int8)
    lens = np.zeros(n, np.int32)
    name_off = np.zeros(n, np.int64)
    name_len = np.zeros(n, np.int32)
    got = int(lib.aft_decode_fastq(
        data, len(data), seq.ctypes.data_as(ctypes.c_void_p), max_len,
        lens.ctypes.data_as(ctypes.c_void_p),
        name_off.ctypes.data_as(ctypes.c_void_p),
        name_len.ctypes.data_as(ctypes.c_void_p), n))
    if got < 0:
        return None
    names = []
    for i in range(got):
        nm = data[name_off[i]: name_off[i] + name_len[i]].decode()
        if nm.endswith("/1") or nm.endswith("/2"):
            nm = nm[:-2]
        names.append(nm)
    return names, seq[:got], lens[:got]


def encode_dna_native(data: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(data), np.int8)
    lib.aft_encode_dna(data, len(data), out.ctypes.data_as(ctypes.c_void_p))
    return out
