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


def build_seed_matrix(ref: np.ndarray, read_len: int, dtype=jnp.bfloat16) -> jax.Array:
    """Im2col the reference for diagonal seeding against reads of width R.

    Returns W of shape (R*4, D) with D = L + R - 1; column j holds the one-hot
    reference window starting at offset j - (R-1) (out-of-bounds rows zero).
    Built once per (reference, read width); ~R*4*L*2 bytes in HBM.
    """
    R = read_len
    ref = jnp.asarray(ref, dtype=jnp.int8)
    L = ref.shape[0]
    D = L + R - 1
    # padded one-hot reference: (L + 2(R-1), 4), zeros outside
    ref1h = one_hot(ref, dtype)
    pad = jnp.zeros((R - 1, N_REAL), dtype)
    ref1h_p = jnp.concatenate([pad, ref1h, pad], axis=0)

    @jax.jit
    def _build(ref1h_p):
        # W[r, c, j] = ref1h_p[j + r, c]
        idx = jnp.arange(D)[None, :] + jnp.arange(R)[:, None]  # (R, D)
        win = jnp.take(ref1h_p, idx.reshape(-1), axis=0).reshape(R, D, N_REAL)
        return jnp.transpose(win, (0, 2, 1)).reshape(R * N_REAL, D)

    return _build(ref1h_p)


@functools.partial(jax.jit, static_argnames=("dtype",))
def diag_match_counts_w(reads: jax.Array, seed_matrix: jax.Array,
                        dtype=jnp.bfloat16) -> jax.Array:
    """Match counts for every (read, diagonal) via the prebuilt patch matrix.

    Args:
      reads:       (B, R) int8 codes.
      seed_matrix: (R*4, L+R-1) from :func:`build_seed_matrix`.
    Returns:
      (B, L+R-1) float32 diagonal match counts.
    """
    B, R = reads.shape
    read1h = one_hot(reads, dtype).reshape(B, R * N_REAL)
    return jnp.dot(read1h, seed_matrix, preferred_element_type=jnp.float32)


def diag_match_counts(reads: jax.Array, ref: jax.Array) -> jax.Array:
    """Convenience one-shot form: build the patch matrix and multiply."""
    W = build_seed_matrix(np.asarray(ref), int(reads.shape[1]))
    return diag_match_counts_w(jnp.asarray(reads), W)


def diag_index_to_ref_offset(idx: jax.Array, read_len_padded: int) -> jax.Array:
    """Convert a diagonal index j into the ref offset of read position 0."""
    return idx - (read_len_padded - 1)
