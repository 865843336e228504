"""Base encoding: ASCII DNA -> int8 codes -> one-hot device arrays.

Code space: A=0, C=1, G=2, T=3, N=4, PAD=5.  N and PAD one-hot to the zero
vector so they never count as matches in the seeding matmul — mirroring how
the reference's consensus voting skips non-ACGT bases (functions.py:183-191).
The reverse complement is ``3 - code`` for real bases, identity for N/PAD.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BASE_A, BASE_C, BASE_G, BASE_T, BASE_N, PAD = 0, 1, 2, 3, 4, 5
N_CODES = 6  # A C G T N PAD
N_REAL = 4   # one-hot channels

_LUT = np.full(256, BASE_N, dtype=np.int8)
for _ch, _code in (("A", BASE_A), ("C", BASE_C), ("G", BASE_G), ("T", BASE_T)):
    _LUT[ord(_ch)] = _code
    _LUT[ord(_ch.lower())] = _code
_DECODE = np.array(list("ACGTN."), dtype="U1")

_RC = np.array([BASE_T, BASE_G, BASE_C, BASE_A, BASE_N, PAD], dtype=np.int8)


def encode_ascii(seq: bytes | str, length: int | None = None) -> np.ndarray:
    """Encode an ASCII sequence to int8 codes, optionally right-padded to `length`."""
    if isinstance(seq, str):
        seq = seq.encode()
    arr = _LUT[np.frombuffer(seq, dtype=np.uint8)]
    if length is not None:
        out = np.full(length, PAD, dtype=np.int8)
        n = min(len(arr), length)
        out[:n] = arr[:n]
        return out
    return arr.copy()


def decode_to_str(codes: np.ndarray) -> str:
    """Decode int8 codes back to an ASCII string (PAD -> '.', trimmed at end)."""
    codes = np.asarray(codes)
    s = "".join(_DECODE[np.clip(codes, 0, 5)])
    return s.rstrip(".")


def revcomp(codes):
    """Reverse-complement along the last axis (works for numpy or jnp arrays)."""
    if isinstance(codes, np.ndarray):
        return _RC[codes][..., ::-1]
    rc = jnp.asarray(_RC)
    return rc[codes][..., ::-1]


def pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """(B, R) int8 codes (values 0..5) -> (B, R/2) uint8, two codes per byte.

    Host->device transfers ride a ~83MB/s relay in this environment — halving
    the read-batch bytes halves the aligner's dominant cost.  R must be even
    (reads are padded to 128 lanes).
    """
    a = np.asarray(codes, np.uint8)
    assert a.shape[-1] % 2 == 0, "pack_nibbles needs an even row width"
    return (a[..., 0::2] | (a[..., 1::2] << 4)).astype(np.uint8)


def unpack_nibbles(packed, R: int):
    """Device-side inverse of :func:`pack_nibbles`: (B, R/2) uint8 -> (B, R) int8."""
    p = jnp.asarray(packed)
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1], R)


def one_hot(codes, dtype=jnp.bfloat16):
    """One-hot over the 4 real bases; N/PAD map to the zero vector.

    Shape (..., L) -> (..., L, 4).
    """
    codes = jnp.asarray(codes)
    return (codes[..., None] == jnp.arange(N_REAL, dtype=codes.dtype)).astype(dtype)
