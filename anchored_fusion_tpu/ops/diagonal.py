"""All-diagonal seeding on the MXU.

This is the TPU-native replacement for bwa-mem seeding and BLAT k-mer stepping
against *small* references (the anchored transcript, candidate-region FASTAs,
consensus-vs-transcript validation — functions.py:182, :966, :1007, :1122).

Instead of hashing k-mers, we compute, for every read and every alignment
diagonal, the exact number of matching bases:

    diag_count[b, j] = sum_r sum_c read1h[b, r, c] * ref1h[j - (R-1) + r, c]

i.e. the match count when read ``b`` starts at reference offset ``j-(R-1)``.
This is *full* sensitivity (equivalent to blat -stepSize=1 -minMatch=1) at MXU
speed; mismatch/indel tolerance comes from the Kadane extension over the top-K
diagonals (ops/kadane.py).  N and PAD one-hot to zero, so never match.

Implementation: the reference side is lowered once into an im2col "patch
matrix" W of shape (R*4, L+R-1) with W[r*4+c, j] = ref1h[j-(R-1)+r, c]; every
read batch is then a single (B, R*4) @ (R*4, L+R-1) matmul — the ideal MXU
shape, with the im2col cost amortized across all batches of a run.  (A
conv_general_dilated formulation is mathematically identical but lowers far
worse on current TPU runtimes for 128-wide filters with thousands of output
channels.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from anchored_fusion_tpu.ops.encode import one_hot, N_REAL


def build_seed_matrix(ref: np.ndarray, read_len: int, dtype=jnp.bfloat16,
                      stride: int = 1) -> jax.Array:
    """Im2col the reference for diagonal seeding against reads of width R.

    Returns W of shape (Rs*4, D) with D = L + R - 1 and Rs = ceil(R/stride);
    column j holds the one-hot reference window starting at offset j - (R-1)
    (out-of-bounds rows zero), sampled at every ``stride``-th read position.
    Built once per (reference, read width); ~Rs*4*L bytes in HBM.

    ``stride`` trades seeding sensitivity for FLOPs (the MXU analogue of
    blat's -stepSize / bwa's sparse seeding): a true diagonal still collects
    ~R/stride matches, noise diagonals scale down equally, and the Kadane
    extension always runs at full resolution.  int8 one-hots keep the matmul
    on the MXU's double-rate int8 path with exact int32 counts.
    """
    R = read_len
    ref = jnp.asarray(ref, dtype=jnp.int8)
    L = ref.shape[0]
    D = L + R - 1
    rows = np.arange(0, R, stride)
    # padded one-hot reference: (L + 2(R-1), 4), zeros outside
    ref1h = one_hot(ref, dtype)
    pad = jnp.zeros((R - 1, N_REAL), dtype)
    ref1h_p = jnp.concatenate([pad, ref1h, pad], axis=0)

    @jax.jit
    def _build(ref1h_p):
        # W[r, c, j] = ref1h_p[j + r, c] for r in sampled rows
        idx = jnp.arange(D)[None, :] + jnp.asarray(rows)[:, None]  # (Rs, D)
        win = jnp.take(ref1h_p, idx.reshape(-1), axis=0).reshape(len(rows), D, N_REAL)
        return jnp.transpose(win, (0, 2, 1)).reshape(len(rows) * N_REAL, D)

    return _build(ref1h_p)


@functools.partial(jax.jit, static_argnames=("stride",))
def diag_match_counts_w(reads: jax.Array, seed_matrix: jax.Array,
                        stride: int = 1) -> jax.Array:
    """Match counts for every (read, diagonal) via the prebuilt patch matrix.

    Args:
      reads:       (B, R) int8 codes.
      seed_matrix: (ceil(R/stride)*4, L+R-1) from :func:`build_seed_matrix`.
    Returns:
      (B, L+R-1) int32 diagonal match counts (at the sampled positions).
    """
    B, R = reads.shape
    dtype = seed_matrix.dtype
    read1h = one_hot(reads[:, ::stride], dtype).reshape(B, -1)
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    out = jnp.dot(read1h, seed_matrix, preferred_element_type=acc)
    return out


def diag_match_counts(reads: jax.Array, ref: jax.Array) -> jax.Array:
    """Convenience one-shot form: build the patch matrix and multiply."""
    W = build_seed_matrix(np.asarray(ref), int(reads.shape[1]))
    return diag_match_counts_w(jnp.asarray(reads), W)


def diag_index_to_ref_offset(idx: jax.Array, read_len_padded: int) -> jax.Array:
    """Convert a diagonal index j into the ref offset of read position 0."""
    return idx - (read_len_padded - 1)
