"""k-mer seed index for genome-scale references.

The all-diagonal MXU seeder (ops/diagonal.py) is exact but O(L) per read per
diagonal set — ideal for the ~7kb anchored transcript, infeasible for a 3Gbp
genome.  Genome-scale seeding instead uses a direct-address k-mer bucket
table (the role bwa's FM-index and BLAT's 11-mer table play in the reference
pipeline: Anchored_Fusion.py:102/:188, functions.py:341/:530/:716/:1244):

  * build (host, numpy): pack every k-window into a base-4 int32 key, drop
    windows containing N, sort positions by key (radix sort), and build a
    bucket table ``table[b] = first sorted slot whose key-prefix >= b``.
    When the prefix covers the whole k-mer the table IS the hash: a query
    key's hit range is ``[table[key], table[key+1])`` — two vector gathers,
    no binary search.  For small references the prefix is shortened (the
    table scales with the reference, not 4^k) and hits are validated by
    comparing gathered keys.
  * query (device, JAX): two table gathers -> per-k-mer position lists capped
    at ``max_hits`` -> diagonal voting -> top-K diagonals per read for
    Kadane/SW extension.

A binary-search (``searchsorted``) path is kept for comparison; on this TPU
runtime the 25-step dependent-gather loop of a binary search over tens of
millions of keys costs ~150ms per batch where the table lookup costs ~2ms.

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


def pack_kmers_host(codes: np.ndarray, k: int, stride: int = 1) -> np.ndarray:
    """Base-4 keys of every ``stride``-th k-window; -1 where the window
    contains non-ACGT.  Window i covers genome position ``i * stride``.

    int32 keys (k <= 15): half the sort and device-lookup traffic of int64.
    """
    assert k <= 15, "int32 keys require k <= 15"
    L = codes.shape[0]
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, np.int32)
    m = -(-n // stride)
    # hoist the N-masking and int32 cast out of the k-loop: one pass over the
    # genome instead of k (the build-time hot loop at hg38 scale)
    cc = np.where(codes < 4, codes, 0).astype(np.int32)
    badc = codes >= 4
    keys = np.zeros(m, dtype=np.int32)
    bad = np.zeros(m, dtype=bool)
    for j in range(k):
        keys *= 4
        keys += cc[j:j + n:stride]
        bad |= badc[j:j + n:stride]
    keys[bad] = -1
    return keys


def bucket_bits_for(n_kmers: int, k: int) -> int:
    """Prefix bases of the direct-address table.

    Full-k (exact, searchless) once the reference is large enough that the
    4^k table is proportionate; otherwise ~4 buckets per stored k-mer so
    buckets stay near-empty and the key-check gather resolves them exactly.
    """
    if n_kmers <= 0:
        return 1
    kb = int(np.ceil(np.log2(max(n_kmers, 2) * 4) / 2))
    return max(4, min(k, kb))


@dataclasses.dataclass
class KmerIndex:
    """Sorted k-mer index + direct-address bucket table over one reference
    (or one genome shard)."""

    k: int
    kb: int                  # bucket prefix bases; kb == k -> exact table
    table: jax.Array         # (4^kb + 1,) int32 bucket -> first sorted slot
    keys_sorted: jax.Array   # (M,) int32 — sorted valid k-mer keys
    pos_sorted: jax.Array    # (M,) int32 — positions, same order
    ref_len: int
    shard_offset: int = 0    # global position of this shard's base

    @classmethod
    def build(cls, codes: np.ndarray, k: int, shard_offset: int = 0,
              bucket_bases: Optional[int] = None,
              stride: int = 1) -> "KmerIndex":
        kv, pos, table, kb = build_index_arrays(
            np.asarray(codes), k, bucket_bases, stride=stride)
        return cls(
            k=k,
            kb=kb,
            table=jnp.asarray(table),
            keys_sorted=jnp.asarray(kv),
            pos_sorted=jnp.asarray(pos),
            ref_len=int(codes.shape[0]),
            shard_offset=shard_offset,
        )


def build_index_arrays(codes: np.ndarray, k: int,
                       bucket_bases: Optional[int] = None, stride: int = 1):
    """Host-side build: (keys_sorted i32, pos_sorted i32, table i32, kb).

    ``stride`` samples every stride-th genome window (sparse BLAT-style
    tiling); positions stay true genome coordinates."""
    keys = pack_kmers_host(codes, k, stride)
    valid = keys >= 0
    pos = (np.nonzero(valid)[0] * stride).astype(np.int32)
    kv = keys[valid]
    order = np.argsort(kv, kind="stable")     # radix sort on int32
    kv = kv[order]
    pos = pos[order]
    kb = bucket_bases or bucket_bits_for(len(kv), k)
    buckets = kv if kb == k else (kv >> np.int32(2 * (k - kb)))
    cnt = np.bincount(buckets, minlength=(1 << (2 * kb)))
    table = np.zeros((1 << (2 * kb)) + 1, np.int32)
    # int32 accumulation straight into the table view: a dtype-mismatched
    # cumsum falls back to a buffered elementwise cast (~60x slower at 4^13)
    np.cumsum(cnt, dtype=np.int32, out=table[1:])
    return kv, pos, table, kb


@functools.partial(jax.jit, static_argnames=("k", "stride", "n"))
def _pack_keys_chunk(codes: jax.Array, k: int, stride: int, n: int):
    """Keys of the first ``n`` windows of one codes chunk (int32, sentinel
    for N/PAD windows).  Bounded temps: the int32 cast + k strided slices
    live only at chunk size, never genome size."""
    cc = jnp.where(codes < 4, codes, 0).astype(jnp.int32)
    badc = codes >= 4
    m = -(-n // stride)
    keys = jnp.zeros((m,), jnp.int32)
    bad = jnp.zeros((m,), bool)
    for j in range(k):
        keys = keys * 4 + jax.lax.slice(cc, (j,), (j + n,), (stride,))
        bad = bad | jax.lax.slice(badc, (j,), (j + n,), (stride,))
    return jnp.where(bad, jnp.int32(np.iinfo(np.int32).max), keys)


@functools.partial(jax.jit, static_argnames=("k", "kb", "stride"))
def _sort_and_table(keys: jax.Array, k: int, kb: int, stride: int):
    """Stable key sort (ONE two-operand lax.sort: sorted keys + positions)
    and the bucket table via sort-method searchsorted."""
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    keys_sorted, order = jax.lax.sort((keys, iota), num_keys=1,
                                      is_stable=True)
    pos_sorted = order * stride
    starts = (jnp.arange((1 << (2 * kb)) + 1, dtype=jnp.int32)
              << (2 * (k - kb)))
    table = jnp.searchsorted(keys_sorted, starts, side="left",
                             method="sort").astype(jnp.int32)
    return keys_sorted, pos_sorted, table


# key-packing chunk (bases).  Per call the int32 cast is 4x this and the k
# strided slices add ~k/stride x; 2^26 keeps one call's temps ~1.5GB with
# k=13/stride=4 — small enough to coexist with already-built shards in HBM.
_PACK_CHUNK = 1 << 26


def build_shard_index_device(codes: jax.Array, k: int, kb: int,
                             stride: int = 1, keep_keys: bool = False):
    """Device-side shard index build: (keys_or_none, pos_sorted, table).

    The host build (numpy stable argsort) runs at ~2.5M keys/s on this
    machine; the TPU sorts at ~300M/s, so hg38-scale builds go on device:
    pack keys with k static strided slices, push N-containing windows to a
    sentinel that sorts past every real bucket, stable-sort, and derive
    the bucket table with one sort-method searchsorted.  Invalid windows
    stay in the arrays (fixed shapes) but no table range ever reaches them.

    Key packing is CHUNKED (``_PACK_CHUNK`` bases per dispatch): a single
    whole-shard pack materializes the int32 cast of the full shard plus k
    strided int32 slices simultaneously (~15GB of HLO temps at a 1Gbp
    shard — the hg38 OOM), while chunking bounds temps at ~1.5GB and the
    concatenated key array is bit-identical.  Sort + argsort share ONE
    two-operand ``lax.sort``.

    With kb == k the table is exact and ``keys_sorted`` is never read by
    ``lookup_hits_table``; None is returned so hg38-scale indexes skip a
    genome-sized array entirely (host->device transfer is 83MB/s here).
    """
    L = int(codes.shape[0])
    n = L - k + 1
    if n <= 0:  # degenerate shard shorter than k: empty index, zero table
        empty = jnp.zeros((0,), jnp.int32)
        table = jnp.zeros((1 << (2 * kb)) + 1, jnp.int32)
        return (None if kb == k else empty), empty, table
    C = (_PACK_CHUNK // stride) * stride       # chunk starts stay stride-aligned
    parts = []
    for lo in range(0, n, C):
        n_c = min(C, n - lo)
        # windows [lo, lo+n_c) need codes[lo : lo+n_c+k-1]
        chunk = jax.lax.slice(codes, (lo,), (min(L, lo + n_c + k - 1),))
        parts.append(_pack_keys_chunk(chunk, k, stride, n_c))
    keys = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    keys_sorted, pos_sorted, table = _sort_and_table(keys, k, kb, stride)
    # ``keep_keys``: the XL merged-index build needs the sorted keys to
    # compute per-slot destination offsets (align/genome_xl.py), even though
    # lookups never read them at kb == k
    if keep_keys:
        return keys_sorted, pos_sorted, table
    return (None if kb == k else keys_sorted), pos_sorted, table


@functools.partial(jax.jit, static_argnames=("k",))
def pack_read_kmers(reads: jax.Array, offsets: jax.Array, k: int):
    """Keys of read k-mers at the given offsets.

    Args:
      reads:   (B, R) int8.
      offsets: (Q,) int32 k-mer start offsets within the read.
    Returns (keys (B, Q) int32, valid (B, Q) bool).
    """
    B, R = reads.shape
    idx = offsets[:, None] + jnp.arange(k)[None, :]        # (Q, k)
    sub = reads[:, idx]                                    # (B, Q, k)
    bad = jnp.any(sub >= 4, axis=-1)
    sub = jnp.where(sub < 4, sub, 0).astype(jnp.int32)
    weights = (4 ** jnp.arange(k - 1, -1, -1)).astype(jnp.int32)
    keys = jnp.sum(sub * weights[None, None, :], axis=-1)
    return keys, ~bad


@functools.partial(jax.jit, static_argnames=("k", "stride"))
def pack_read_kmers_strided(reads: jax.Array, k: int, stride: int):
    """Strided-offset variant built from k static slices — no gather.

    Equivalent to ``pack_read_kmers(reads, arange(0, R-k+1, stride), k)`` but
    each of the k base positions is a static strided slice of the read array,
    which lowers to cheap windowed loads instead of a (B, Q, k) gather.
    """
    B, R = reads.shape
    n = R - k + 1
    keys = jnp.zeros((B, n), jnp.int32)
    bad = jnp.zeros((B, n), bool)
    for j in range(k):
        c = reads[:, j:j + n]
        keys = keys * 4 + jnp.where(c < 4, c, 0).astype(jnp.int32)
        bad = bad | (c >= 4)
    keys = keys[:, ::stride]
    bad = bad[:, ::stride]
    return keys, ~bad


def read_kmer_offsets(R: int, k: int, stride: int) -> np.ndarray:
    """The offsets matching :func:`pack_read_kmers_strided`'s output."""
    return np.arange(0, R - k + 1, stride, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("max_hits", "k", "kb"))
def lookup_hits_table(table: jax.Array, keys_sorted: jax.Array,
                      index_pos: jax.Array, keys: jax.Array, valid: jax.Array,
                      max_hits: int, k: int, kb: int):
    """Positions of each query k-mer via the direct-address bucket table.

    Two vector gathers into the table give the bucket's sorted-slot range;
    hits are the first ``max_hits`` slots.  With kb == k the range is exactly
    the query key's (no key check needed); with kb < k the bucket may hold
    several keys, so gathered keys are compared against the query — k-mers
    whose bucket is dominated by other (repeat) keys lose hits beyond the
    window, the same spirit as bwa's seed-occurrence cap.

    Returns (positions (..., max_hits) int32, hit_valid (..., max_hits) bool).
    """
    M = index_pos.shape[0]
    if kb < k:
        bucket = (keys >> (2 * (k - kb))).astype(jnp.int32)
    else:
        bucket = keys
    bucket = jnp.clip(bucket, 0, table.shape[0] - 2)
    lo = table[bucket]
    hi = table[bucket + 1]
    take = jnp.arange(max_hits, dtype=jnp.int32)
    idx = lo[..., None] + take
    ok = (idx < hi[..., None]) & valid[..., None]
    idxc = jnp.clip(idx, 0, M - 1)
    pos = index_pos[idxc]
    if kb < k:
        kg = keys_sorted[idxc]
        ok = ok & (kg == keys[..., None])
    return pos, ok


@functools.partial(jax.jit, static_argnames=("max_hits",))
def lookup_hits(index_keys: jax.Array, index_pos: jax.Array,
                keys: jax.Array, valid: jax.Array, max_hits: int):
    """Binary-search lookup (kept for comparison/testing; the table path is
    ~75x faster on this TPU runtime — see module docstring).

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
def vote_diagonals2(rows: jax.Array, cols: jax.Array, valid: jax.Array,
                    top_k: int):
    """Top-K most-voted (row, col) diagonal PAIRS per read.

    Two-key variant of :func:`vote_diagonals` for references whose diagonal
    coordinate exceeds int32 (hg38 is 3.1e9): the diagonal is carried as a
    (tile row, in-tile column) pair and sorted lexicographically by ONE fused
    two-operand ``lax.sort``; the run-length vote logic treats a new run as a
    change in EITHER key.  Returns (row (B, top_k), col (B, top_k),
    votes (B, top_k)); invalid slots have votes == 0.
    """
    B, C = rows.shape
    big = jnp.int32(2 ** 30)
    r = jnp.where(valid, rows, big)
    c = jnp.where(valid, cols, big)
    r, c = jax.lax.sort((r, c), num_keys=2, is_stable=False)
    new_run = jnp.concatenate(
        [jnp.ones((B, 1), bool),
         (r[:, 1:] != r[:, :-1]) | (c[:, 1:] != c[:, :-1])], axis=1)
    idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), r.shape)
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0), axis=1)
    cnt = idx - run_start + 1
    is_end = jnp.concatenate([new_run[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    score = jnp.where(is_end & (r != big), cnt, 0)
    votes, where = jax.lax.top_k(score, top_k)
    row = jnp.take_along_axis(r, where, axis=1)
    col = jnp.take_along_axis(c, where, axis=1)
    return row, col, votes


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
