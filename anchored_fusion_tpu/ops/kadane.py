"""Maximal-scoring-segment (Kadane) via parallel prefix scans.

Given per-position match/mismatch scores along a diagonal, find the contiguous
segment with maximal score — exactly the ungapped local alignment bwa-mem's
extension produces when no gaps are opened, and the source of the soft-clip
boundaries the reference pipeline keys every downstream stage on
(SM/MS classification: functions.py:921-930).

Formulated without any sequential scan: with prefix sums P and P'[t] = P[t-1],

    best(t) = P[t] - min_{j<=t} P'[j],   segment = [argmin P', argmax best]

so the whole extension is cumsum + cummin + cummax + argmax — log-depth on the
VPU, trivially batched over (reads x diagonals), and orders of magnitude
cheaper to compile than a `lax.scan` formulation.  First-occurrence tie
handling matches serial Kadane (earliest segment start and end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Penalty for out-of-bounds / padded positions: large enough that no optimal
# segment ever crosses one (max attainable bonus is the read length), small
# enough that int32 prefix sums can never overflow.
INVALID = -1000


@jax.jit
def best_segment(scores: jax.Array, is_match: jax.Array):
    """Maximal scoring contiguous segment along the last axis.

    Args:
      scores:   (..., R) int32 per-position contribution (e.g. +1 match,
                -4 mismatch, INVALID for out-of-bounds/pad).
      is_match: (..., R) int32 1 where the position is an exact match.
    Returns dict of (...,) int32 arrays:
      score, start, end (inclusive), matches, length.
    """
    scores = scores.astype(jnp.int32)
    is_match = is_match.astype(jnp.int32)
    R = scores.shape[-1]
    P = jnp.cumsum(scores, axis=-1)                       # P[t] = sum[0..t]
    zeros = jnp.zeros_like(P[..., :1])
    Ps = jnp.concatenate([zeros, P[..., :-1]], axis=-1)   # Ps[t] = P[t-1]
    ax = Ps.ndim - 1  # lax cumulative ops reject negative axes
    cmin = jax.lax.cummin(Ps, axis=ax)                    # min prefix before t
    val = P - cmin                                        # best segment ending at t
    best = jnp.max(val, axis=-1)
    end = jnp.argmax(val, axis=-1).astype(jnp.int32)      # earliest max end
    # argmin of Ps with first-occurrence ties: positions setting a strict new
    # minimum, tracked with a running max of their indices.
    prev_min = jnp.concatenate(
        [jnp.full_like(Ps[..., :1], jnp.iinfo(jnp.int32).max), cmin[..., :-1]], axis=-1)
    newmin = Ps < prev_min
    idx = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32), Ps.shape)
    argmin_prefix = jax.lax.cummax(jnp.where(newmin, idx, -1), axis=ax)
    # point lookups as select+reduce, NOT take_along_axis: a lane-axis gather
    # is the slow path on this TPU runtime (~20% of the whole extension);
    # masking one lane and summing is a plain VPU reduce
    at_end = idx == end[..., None]
    start = jnp.sum(jnp.where(at_end, argmin_prefix, 0), axis=-1)
    # matches inside [start, end]
    Pm = jnp.cumsum(is_match, axis=-1)
    Pms = jnp.concatenate([jnp.zeros_like(Pm[..., :1]), Pm[..., :-1]], axis=-1)
    m_end = jnp.sum(jnp.where(at_end, Pm, 0), axis=-1)
    m_start = jnp.sum(jnp.where(idx == start[..., None], Pms, 0), axis=-1)
    length = jnp.maximum(end - start + 1, 0)
    return {
        "score": best,
        "start": start,
        "end": end,
        "matches": m_end - m_start,
        "length": length,
    }


@functools.partial(jax.jit, static_argnames=("match", "mismatch"))
def segment_scores(read: jax.Array, ref_window: jax.Array, valid: jax.Array,
                   match: int = 1, mismatch: int = 4):
    """Per-position scores/matches for a read laid along a gathered ref window.

    Args:
      read:       (..., R) int8 codes.
      ref_window: (..., R) int8 codes gathered along the diagonal.
      valid:      (..., R) bool — in-bounds on both read and reference.
    """
    eq = (read == ref_window) & valid & (read < 4)
    sc = jnp.where(eq, jnp.int32(match), jnp.int32(-mismatch))
    sc = jnp.where(valid, sc, jnp.int32(INVALID))
    return sc, eq.astype(jnp.int32)
