"""k-mer seed index for genome-scale references.

The all-diagonal MXU seeder (ops/diagonal.py) is exact but O(L) per read per
diagonal set — ideal for the ~7kb anchored transcript, infeasible for a 3Gbp
genome.  Genome-scale seeding instead uses this classic sorted k-mer index
(the role bwa's FM-index and BLAT's 11-mer table play in the reference
pipeline: Anchored_Fusion.py:102/:188, functions.py:341/:530/:716/:1244):

  * build (host, numpy): pack every k-window into a base-4 key, drop windows
    containing N, sort positions by key.  Two int32 arrays — O(L) memory,
    no 4^k direct-address table.
  * query (device, JAX): binary-search read k-mers in the sorted key array
    (vectorized ``searchsorted`` — log L gathers), emit capped per-k-mer hit
    lists, vote on alignment diagonals, and return the top-K diagonals per
    read for Kadane/SW extension.

Sharding plan (SURVEY §2.3): one index per genome slice with slice-local
int32 positions; reads are replicated across the shard axis of the mesh, each
device votes on its slice, and per-read best-hit reduction rides an
``all_gather`` of the tiny (B, K) result arrays (see parallel/collectives.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_kmers_host(codes: np.ndarray, k: int) -> np.ndarray:
    """Base-4 keys of all k-windows; -1 where the window contains non-ACGT."""
    L = codes.shape[0]
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, np.int64)
    keys = np.zeros(n, dtype=np.int64)
    bad = np.zeros(n, dtype=bool)
    for j in range(k):
        c = codes[j:j + n]
        keys = keys * 4 + np.where(c < 4, c, 0)
        bad |= c >= 4
    return np.where(bad, -1, keys)


@dataclasses.dataclass
class KmerIndex:
    """Sorted k-mer index over one reference (or one genome shard)."""

    k: int
    keys_sorted: jax.Array   # (M,) int64 — sorted valid k-mer keys
    pos_sorted: jax.Array    # (M,) int32 — positions, same order
    ref_len: int
    shard_offset: int = 0    # global position of this shard's base

    @classmethod
    def build(cls, codes: np.ndarray, k: int, shard_offset: int = 0) -> "KmerIndex":
        keys = pack_kmers_host(np.asarray(codes), k)
        valid = keys >= 0
        pos = np.nonzero(valid)[0].astype(np.int32)
        kv = keys[valid]
        order = np.argsort(kv, kind="stable")
        return cls(
            k=k,
            keys_sorted=jnp.asarray(kv[order]),
            pos_sorted=jnp.asarray(pos[order]),
            ref_len=int(codes.shape[0]),
            shard_offset=shard_offset,
        )


@functools.partial(jax.jit, static_argnames=("k",))
def pack_read_kmers(reads: jax.Array, offsets: jax.Array, k: int):
    """Keys of read k-mers at the given offsets.

    Args:
      reads:   (B, R) int8.
      offsets: (Q,) int32 k-mer start offsets within the read.
    Returns (keys (B, Q) int64, valid (B, Q) bool).
    """
    B, R = reads.shape
    idx = offsets[:, None] + jnp.arange(k)[None, :]        # (Q, k)
    sub = reads[:, idx]                                    # (B, Q, k)
    bad = jnp.any(sub >= 4, axis=-1)
    sub = jnp.where(sub < 4, sub, 0).astype(jnp.int64)
    weights = (4 ** jnp.arange(k - 1, -1, -1)).astype(jnp.int64)
    keys = jnp.sum(sub * weights[None, None, :], axis=-1)
    return keys, ~bad


@functools.partial(jax.jit, static_argnames=("max_hits",))
def lookup_hits(index_keys: jax.Array, index_pos: jax.Array,
                keys: jax.Array, valid: jax.Array, max_hits: int):
    """Positions of each query k-mer in the index, capped at ``max_hits``.

    Returns (positions (..., max_hits) int32, hit_valid (..., max_hits) bool).
    Repeat-rich k-mers are truncated to their first ``max_hits`` sorted
    positions (the role of blat -repMatch / bwa -c repeat capping).
    """
    lo = jnp.searchsorted(index_keys, keys, side="left")
    hi = jnp.searchsorted(index_keys, keys, side="right")
    n = hi - lo
    take = jnp.arange(max_hits, dtype=jnp.int32)
    idx = lo[..., None] + take
    ok = (take < n[..., None]) & valid[..., None]
    M = index_pos.shape[0]
    pos = index_pos[jnp.clip(idx, 0, M - 1)]
    return pos, ok


@functools.partial(jax.jit, static_argnames=("top_k",))
def vote_diagonals(diags: jax.Array, valid: jax.Array, top_k: int):
    """Top-K most-voted diagonals per read.

    Args:
      diags: (B, C) int32 candidate diagonals (ref_pos - read_offset).
      valid: (B, C) bool.
    Returns (diag (B, top_k) int32, votes (B, top_k) int32); invalid slots
    have votes == 0.
    """
    B, C = diags.shape
    big = jnp.int32(2 ** 30)
    d = jnp.where(valid, diags, big)
    d = jnp.sort(d, axis=1)
    new_run = jnp.concatenate(
        [jnp.ones((B, 1), bool), d[:, 1:] != d[:, :-1]], axis=1)
    # run length at each position via distance to the last run start (pure
    # cummax — no scatter/segment_sum, which compiles poorly); the run END
    # carries the full vote count, so scoring only run ends yields exactly one
    # candidate per distinct diagonal.
    idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), d.shape)
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0), axis=1)
    cnt = idx - run_start + 1
    is_end = jnp.concatenate([new_run[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    score = jnp.where(is_end & (d != big), cnt, 0)
    votes, where = jax.lax.top_k(score, top_k)
    diag = jnp.take_along_axis(d, where, axis=1)
    return diag, votes
