"""Batched read alignment against an in-memory reference.

One engine replaces every alignment tool invocation in the reference pipeline:

  * ``bwa mem`` reads -> anchored transcript (Anchored_Fusion.py:182)
  * ``bwa mem`` rescued mates / clipped reads -> genome (:188, functions.py:716)
  * all six ``blat`` passes (functions.py:341, :530, :966, :1007, :1122, :1244,
    :1522) via per-stage sensitivity presets (config.StagePreset).

Pipeline per read batch (all fixed-shape, all on device):

  1. **Seed** — exact match counts on *every* diagonal via one one-hot
     cross-correlation on the MXU (ops/diagonal.py).  Both strands.
  2. **Extend** — for the top-K diagonals, gather the reference window and run
     the Kadane maximal-segment scan (ops/kadane.py) with bwa-mem scoring
     (+1/-4): this yields soft-clip boundaries identical to ungapped bwa-mem
     extension.
  3. **Refine** (optional) — affine-gap Smith-Waterman over the same windows
     (ops/sw.py) for indel-containing reads.

Coordinates follow SAM conventions: for '-'-strand hits, read coordinates are
in the reverse-complemented read (exactly what bwa writes as SEQ), so the
soft-clip algebra downstream (call/breakpoints.py) matches the reference's
SAM parsing (functions.py:916-930).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from anchored_fusion_tpu.config import AlignConfig
from anchored_fusion_tpu.ops.encode import PAD, revcomp
from anchored_fusion_tpu.ops.diagonal import build_seed_matrix, diag_match_counts_w
from anchored_fusion_tpu.ops import kadane


@dataclasses.dataclass
class AlignmentResult:
    """Struct-of-arrays alignment records (host-side numpy).

    All coordinates 0-based; read coords are in the oriented (strand-applied)
    read; ``ref_start``/``ref_end`` inclusive.  ``mapped`` applies the score
    and length thresholds of the preset used.
    """

    score: np.ndarray       # (B,) int32
    strand: np.ndarray      # (B,) int8  0='+', 1='-'
    read_start: np.ndarray  # (B,) int32
    read_end: np.ndarray    # (B,) int32
    ref_start: np.ndarray   # (B,) int64
    ref_end: np.ndarray     # (B,) int64
    matches: np.ndarray     # (B,) int32
    length: np.ndarray      # (B,) int32 (aligned read-span length)
    second_score: np.ndarray  # (B,) int32
    mapped: np.ndarray      # (B,) bool

    @property
    def identity(self) -> np.ndarray:
        return self.matches / np.maximum(self.length, 1)


# Reference patch matrices are ref-dependent but batch-independent; cache by
# CONTENT digest (not id(): CPython reuses addresses after GC, so an id-keyed
# cache can silently serve a stale seed/window matrix for a different
# reference of the same length) so repeated calls against the same anchor /
# candidate reference reuse the device-resident im2col.
_SEED_CACHE: dict = {}

# Max dispatched-but-uncollected chunks in the streaming align loops: deep
# enough to hide dispatch/transfer latency behind compute, shallow enough
# that device memory for in-flight inputs/results stays constant however
# many chunks a multi-million-read batch splits into.
_INFLIGHT_CHUNKS = 4

# Chunks per grouped device->host result pull.  Every host pull is a full
# round trip through the remote TPU relay (~20-250ms latency depending on the
# day, measured in docs/PERFORMANCE.md) while the per-chunk result is tiny
# (9 x chunk int32); stacking _FLUSH_CHUNKS results device-side and pulling
# them as ONE array amortizes that latency.  Groups are double-buffered:
# the oldest sealed group is pulled only once a newer group has been
# dispatched — but the pull itself still BLOCKS the host thread, so each
# mid-stream flush stalls dispatch for one relay round trip.  16 (round 5:
# measured +6-8% over 8 on 360k- and 720k-read streams, adjacent A/B on a
# ~250ms-relay day) halves those stalls at ~26MB of live result buffers;
# 32 showed no further consistent gain (the bigger tail pull eats it).
_FLUSH_CHUNKS = 16

# Device-side stack of a group of same-shape stacked results; one compile per
# (arity, shape), persisted by the compilation cache.
_stack_group = jax.jit(lambda *xs: jnp.stack(xs))


class GroupedPuller:
    """Grouped device->host result pulls, shared by every chunked aligner.

    Chunk results (same-shape stacked device arrays) accumulate into groups
    of ``flush_chunks``; each full group is stacked DEVICE-side (one jitted
    ``jnp.stack``) and crosses the relay as ONE array.  Groups are
    double-buffered: the newest sealed group stays un-pulled so the device
    always has queued work during a transfer.  ``collect(arr, n_real)``
    post-processes each chunk's pulled host array (callers slice padding off
    and/or unstack fields).  One implementation instead of four divergent
    copies (ADVICE r4), all honouring ``_FLUSH_CHUNKS``.
    """

    def __init__(self, collect, flush_chunks: int = _FLUSH_CHUNKS):
        self._collect = collect
        self._flush_chunks = flush_chunks
        self._group = []          # (n_real, stacked) same-shape chunks
        self._sealed = []         # full groups dispatched, not yet pulled
        self.outs = []

    def _flush(self, g):
        if not g:
            return
        if len(g) == 1:
            arrs = [np.asarray(g[0][1])]
        else:
            arrs = np.asarray(_stack_group(*[st for _, st in g]))
        for (n_real, _), a in zip(g, arrs):
            self.outs.append(self._collect(a, n_real))

    def push(self, n_real, st):
        if self._group and self._group[-1][1].shape != st.shape:
            self._sealed.append(self._group)
            self._group = []
        self._group.append((n_real, st))
        if len(self._group) >= self._flush_chunks:
            self._sealed.append(self._group)
            self._group = []
        while len(self._sealed) > 1:
            self._flush(self._sealed.pop(0))

    def finish(self):
        """Flush everything still pending; returns the collected list."""
        self._sealed.append(self._group)
        self._group = []
        for g in self._sealed:
            self._flush(g)
        self._sealed = []
        return self.outs

# Genome-scale references are stored prepadded with this many PAD codes on
# each side so diagonal extension can slice windows directly instead of
# materializing a PAD-guarded copy of the whole genome per dispatch (which
# costs L bytes of HBM + bandwidth per chunk — the 3Gbp OOM).  Must be >= the
# widest query batch (junction consensus batches reach 512).
REF_PREPAD = 768


def _ref_digest(ref_codes: np.ndarray) -> bytes:
    import hashlib
    a = np.ascontiguousarray(np.asarray(ref_codes, np.int8))
    return hashlib.blake2b(a.tobytes(), digest_size=16).digest()


def _seed_matrix_cached(ref_codes: np.ndarray, read_len: int, stride: int = 1,
                        sharding=None):
    """(seed patch matrix, window matrix) for a small reference, cached.

    ``sharding`` places the matrices on a specific mesh (replicated) instead
    of the default device — required when the read batch lives on a mesh of a
    different backend (e.g. the virtual CPU mesh while a TPU is default).
    """
    key = (_ref_digest(ref_codes), read_len, stride, sharding)
    Ws = _SEED_CACHE.get(key)
    if Ws is None:
        Ws = (build_seed_matrix(np.asarray(ref_codes), read_len, stride=stride),
              build_window_matrix(np.asarray(ref_codes), read_len))
        if sharding is not None:
            Ws = tuple(jax.device_put(np.asarray(w), sharding) for w in Ws)
        if len(_SEED_CACHE) > 16:
            _SEED_CACHE.clear()
        _SEED_CACHE[key] = Ws
    return Ws


def both_strands(reads: jax.Array):
    """(B, R) -> ((2B, R) oriented reads, (2B,) coordinate offsets).

    Forward half then reverse-complement half.  The reverse complement is
    computed gather-free (flip + arithmetic complement), which leaves the PAD
    run at the FRONT of each reverse row; instead of rolling rows left (a
    slow per-row gather on TPU), the per-row pad width is returned as a
    coordinate offset that :func:`fold_strands` subtracts from read
    coordinates — equivalent to left-aligned rows, at zero gather cost.
    """
    B, R = reads.shape
    lens = jnp.sum(reads != PAD, axis=1)
    rc = jnp.flip(jnp.where(reads < 4, 3 - reads, reads), axis=1)
    flat = jnp.concatenate([reads, rc], axis=0)
    coord_off = jnp.concatenate([jnp.zeros(B, jnp.int32),
                                 (R - lens).astype(jnp.int32)], axis=0)
    return flat, coord_off


def build_window_matrix(ref_codes: np.ndarray, read_len: int) -> jax.Array:
    """All reference windows as one (L+R+1, R) int8 matrix (PAD-guarded).

    Row j holds ``ref[j-R : j-R+R]`` of the PAD-extended reference, i.e. the
    window for candidate offset ``j - R``.  Window extraction then becomes a
    single-axis ROW gather — ~12x faster on TPU than per-candidate dynamic
    slices.  Memory is (L+R)*R bytes: fine for the anchored transcript and
    candidate references, not for a whole genome (the genome path keeps the
    dynamic-slice gather).
    """
    R = read_len
    refp = np.concatenate([np.full(R, PAD, np.int8),
                           np.asarray(ref_codes, np.int8),
                           np.full(R, PAD, np.int8)])
    W2 = np.lib.stride_tricks.sliding_window_view(refp, R)
    return jnp.asarray(np.ascontiguousarray(W2))


def extend_diagonals_all(flat: jax.Array, ref: jax.Array, offs: jax.Array,
                         match: int, mismatch: int,
                         win_matrix: Optional[jax.Array] = None,
                         ref_prepad: int = 0):
    """Kadane extension of every candidate diagonal (multi-hit, BLAT-like).

    Args:
      flat: (N, R) oriented reads.
      ref:  (L,) reference codes; with ``ref_prepad=P`` > 0 it is already
        ``[PAD*P, genome, PAD*P]`` (built once at index time).  Without it a
        PAD-guarded copy of the WHOLE reference is materialized per dispatch
        — at hg38 scale that is gigabytes of HBM traffic and the allocation
        that OOMed the 3Gbp sharded run, so every genome-sized caller passes
        a prepadded reference.
      offs: (N, k) candidate ref offsets of read position 0 per read
        (genome frame, i.e. NOT including the prepad).
      win_matrix: optional precomputed window matrix (small references).
    Returns dict of (N, k): score, start, end, matches, length — read-frame
    coordinates of each candidate's best segment.
    """
    N, R = flat.shape
    L = ref.shape[0]
    if win_matrix is not None:
        win = win_matrix[jnp.clip(offs + R, 0, win_matrix.shape[0] - 1)]
    elif ref_prepad:
        # prepadded reference: window for offset o covers genome [o, o+R) =
        # ref[o+P : o+P+R].  R <= P keeps every clipped slice inside PAD
        # (same all-PAD windows the unpadded path produced), so results are
        # bit-identical to the concatenate path without the genome-sized copy.
        if R > ref_prepad:
            raise ValueError(f"read width {R} exceeds ref_prepad {ref_prepad}")
        start = jnp.clip(offs + ref_prepad, 0, L - R).astype(jnp.int32)
        win = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(ref, (s,), (R,))))(start)
    else:
        # Contiguous dynamic slices from a PAD-guarded reference: a
        # slice-gather (one 128-wide row per candidate) rather than an
        # elementwise gather of N*k*R scalars (~10x slower on TPU).
        refp = jnp.concatenate(
            [jnp.full(R, PAD, jnp.int8), ref, jnp.full(R, PAD, jnp.int8)])
        start = jnp.clip(offs + R, 0, L + R).astype(jnp.int32)
        win = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(refp, (s,), (R,))))(start)
    read_valid = (flat != PAD)[:, None, :]
    valid = (win != PAD) & read_valid
    sc, ism = kadane.segment_scores(
        jnp.broadcast_to(flat[:, None, :], win.shape), win, valid,
        match=match, mismatch=mismatch)
    return kadane.best_segment(sc, ism)                    # dict of (N, k)


def extend_diagonals(flat: jax.Array, ref: jax.Array, offs: jax.Array,
                     match: int, mismatch: int,
                     win_matrix: Optional[jax.Array] = None,
                     ref_prepad: int = 0):
    """Best-hit Kadane extension (see :func:`extend_diagonals_all`).

    Returns dict of (N,): score, read_start/end, matches, length, off,
    second (score of the runner-up candidate).
    """
    N, R = flat.shape
    k = offs.shape[1]
    seg = extend_diagonals_all(flat, ref, offs, match, mismatch, win_matrix,
                               ref_prepad)
    order = jnp.argsort(-seg["score"], axis=1)
    b1 = order[:, 0]
    b2 = order[:, min(1, k - 1)]
    take = lambda a, j: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
    return {
        "score": take(seg["score"], b1),
        "second": take(seg["score"], b2) if k > 1 else jnp.zeros(N, jnp.int32),
        "rs": take(seg["start"], b1),
        "re": take(seg["end"], b1),
        "mt": take(seg["matches"], b1),
        "ln": take(seg["length"], b1),
        "off": take(offs, b1),
    }


def fold_strands(cand: dict, B: int, coord_off: jax.Array):
    """Fold the (2B,) forward/revcomp candidate halves into per-read records.

    ``coord_off`` (from :func:`both_strands`) converts raw reverse-row
    coordinates (PAD-prefixed) into the left-aligned oriented-read convention;
    reference coordinates use the raw values, so they are unaffected.
    """
    fwd = {n: v[:B] for n, v in cand.items()}
    rev = {n: v[B:] for n, v in cand.items()}
    use_rev = rev["score"] > fwd["score"]
    pick = lambda n: jnp.where(use_rev, rev[n], fwd[n])
    off_best = pick("off")
    rs_raw = pick("rs")
    re_raw = pick("re")
    co = jnp.where(use_rev, coord_off[B:], coord_off[:B])
    out = {
        "score": pick("score"),
        "strand": use_rev.astype(jnp.int8),
        "read_start": rs_raw - co,
        "read_end": re_raw - co,
        "matches": pick("mt"),
        "length": pick("ln"),
        "second_score": jnp.maximum(
            jnp.where(use_rev, rev["second"], fwd["second"]),
            jnp.where(use_rev, fwd["score"], rev["score"])),
        "ref_start": off_best + rs_raw,
        "ref_end": off_best + re_raw,
    }
    return out


@functools.partial(jax.jit, static_argnames=("k", "match", "mismatch", "stride"))
def _align_core(reads: jax.Array, ref: jax.Array, seed_matrix: jax.Array,
                win_matrix: jax.Array,
                k: int, match: int, mismatch: int, stride: int = 1):
    """Both-strand top-k diagonal seeding + Kadane extension.

    Args:
      reads:       (B, R) int8.
      ref:         (L,) int8.
      seed_matrix: (R*4, L+R-1) prebuilt reference patch matrix.
    Returns per-read dict (all (B,)): score, strand, read_start, read_end,
      ref_start, ref_end, matches, length, second_score.
    """
    B, R = reads.shape
    flat, coord_off = both_strands(reads)                  # (2B, R)
    counts = diag_match_counts_w(flat, seed_matrix, stride=stride)
    idx = _block_topk_diagonals(counts, k)                 # (2B, k)
    offs = idx - (R - 1)                                   # ref offset of read pos 0
    cand = extend_diagonals(flat, ref, offs, match, mismatch, win_matrix)
    return fold_strands(cand, B, coord_off)


def _block_topk_diagonals(counts: jax.Array, k: int, block: int = 128) -> jax.Array:
    """Top-k diagonal indices by a two-level block reduction.

    A full-width ``lax.top_k`` over the (2B, L+R-1) counts matrix sorts every
    row — ~30% of the whole alignment's device time.  Seeding only needs the k
    strongest *distinct* diagonals, and near-equal diagonals within one
    128-lane block converge to the same Kadane segment anyway, so: take the
    lane-max of each 128-wide block, top_k over the tiny (2B, D/128) block
    maxima, then the argmax lane inside each selected block.  Counts are
    integers <= R (exact in bfloat16), so the cast costs nothing and halves
    the reduce's HBM traffic.  Indel-split diagonals that fall in one block
    (rare at 128 lanes vs the read length) are recovered by the gapped
    refinement pass (align/refine.py), not seeding.
    """
    N, D = counts.shape
    Dp = -(-D // block) * block
    c = counts.astype(jnp.bfloat16)
    if Dp != D:
        c = jnp.pad(c, ((0, 0), (0, Dp - D)), constant_values=-1.0)
    cb = c.reshape(N, Dp // block, block)
    bmax = jnp.max(cb, axis=-1)                            # (N, D/128)
    kk = min(k, bmax.shape[1])
    _, bidx = jax.lax.top_k(bmax, kk)                      # (N, k)
    sel = jnp.take_along_axis(cb, bidx[:, :, None], axis=1)  # (N, k, 128)
    lane = jnp.argmax(sel, axis=-1).astype(jnp.int32)      # (N, k)
    idx = bidx * block + lane
    if kk < k:
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)), mode="edge")
    return jnp.minimum(idx, D - 1)


# Order of the per-read fields in the stacked (9, B) device result.  A single
# stacked array means ONE device->host transfer per batch; pulling the nine
# fields individually costs nine ~20ms round-trips through the remote TPU
# runtime — 4x the compute time of the whole alignment.
RESULT_FIELDS = ("score", "strand", "read_start", "read_end", "matches",
                 "length", "second_score", "ref_start", "ref_end")


def stack_result(out: dict) -> jax.Array:
    """Pack a fold_strands dict into one (9, B) int32 array (device-side)."""
    return jnp.stack([out[n].astype(jnp.int32) for n in RESULT_FIELDS])


def unstack_result(arr: np.ndarray) -> dict:
    """Host-side inverse of :func:`stack_result`."""
    return {n: arr[i] for i, n in enumerate(RESULT_FIELDS)}


@functools.partial(jax.jit, static_argnames=("k", "match", "mismatch", "stride"))
def _align_core_stacked(reads, ref, seed_matrix, win_matrix,
                        k: int, match: int, mismatch: int, stride: int = 1):
    return stack_result(_align_core(reads, ref, seed_matrix, win_matrix,
                                    k, match, mismatch, stride))


@functools.partial(jax.jit, static_argnames=("k", "match", "mismatch",
                                             "stride", "R"))
def _align_core_stacked_packed(packed, ref, seed_matrix, win_matrix,
                               k: int, match: int, mismatch: int,
                               stride: int, R: int):
    """Nibble-packed entry: the read batch crosses the host->device relay at
    two codes per byte (the transfer IS the aligner's dominant cost here) and
    unpacks on device in one shift/mask.  (An int16 result stack was tried
    for small references — exact, and it halves the return transfer — but
    the int16 program takes the remote TPU toolchain >25 minutes to compile
    vs ~1 minute for int32, so the return stays int32.)"""
    from anchored_fusion_tpu.ops.encode import unpack_nibbles
    reads = unpack_nibbles(packed, R)
    return stack_result(_align_core(reads, ref, seed_matrix, win_matrix,
                                    k, match, mismatch, stride))


@dataclasses.dataclass
class MultiHits:
    """Flat multi-hit records (BLAT-PSL-like), host-side numpy.

    ``q_start``/``q_end`` are 0-based inclusive in the FORWARD query frame
    (PSL convention: query coordinates are never strand-flipped), so consumers
    can reason about which part of the original sequence each hit covers
    (Find_fine_block functions.py:629-649, junction check :1267-1287).
    """

    read_id: np.ndarray    # (M,) int32 index into the query batch
    strand: np.ndarray     # (M,) int8
    score: np.ndarray      # (M,) int32
    matches: np.ndarray    # (M,) int32
    length: np.ndarray     # (M,) int32
    q_start: np.ndarray    # (M,) int32
    q_end: np.ndarray      # (M,) int32
    ref_start: np.ndarray  # (M,) int64
    ref_end: np.ndarray    # (M,) int64


MULTI_FIELDS = ("score", "start", "end", "matches", "length", "off")


def stack_multi(seg: dict) -> jax.Array:
    """Pack an extend_diagonals_all dict into one (6, N, k) int32 array."""
    return jnp.stack([seg[n].astype(jnp.int32) for n in MULTI_FIELDS])


def unstack_multi(arr: np.ndarray) -> dict:
    return {n: arr[i] for i, n in enumerate(MULTI_FIELDS)}


@functools.partial(jax.jit, static_argnames=("k", "match", "mismatch", "stride"))
def _align_multi_core(reads: jax.Array, ref: jax.Array, seed_matrix: jax.Array,
                      win_matrix: jax.Array,
                      k: int, match: int, mismatch: int, stride: int = 1):
    B, R = reads.shape
    flat, _ = both_strands(reads)
    counts = diag_match_counts_w(flat, seed_matrix, stride=stride)
    _, idx = jax.lax.top_k(counts.astype(jnp.bfloat16), k)
    offs = idx - (R - 1)
    seg = extend_diagonals_all(flat, ref, offs, match, mismatch, win_matrix)
    seg["off"] = offs
    return stack_multi(seg)


def _flatten_multi(seg: dict, read_lens: np.ndarray, B: int, k: int,
                   min_score: int, min_identity: float, min_seg_len: int,
                   read_width: int) -> MultiHits:
    """(2B, k) device candidates -> filtered flat MultiHits with PSL q-frame.

    Reverse-half rows come PAD-prefixed from :func:`both_strands`; their raw
    coordinates are shifted by the pad width into the left-aligned oriented
    frame before the forward-q-frame conversion (reference coordinates use
    the raw values and are unaffected).
    """
    score = np.asarray(seg["score"]).reshape(2, B, k)
    start = np.asarray(seg["start"]).reshape(2, B, k)
    end = np.asarray(seg["end"]).reshape(2, B, k)
    matches = np.asarray(seg["matches"]).reshape(2, B, k)
    length = np.asarray(seg["length"]).reshape(2, B, k)
    off = np.asarray(seg["off"]).reshape(2, B, k)
    lens = read_lens[None, :, None]
    ident = matches / np.maximum(length, 1)
    keep = (score >= min_score) & (length >= min_seg_len) & (ident >= min_identity)
    # dedup identical (strand, offset) candidates emerging from adjacent
    # diagonal seeds converging to the same segment
    srt = np.argsort(off, axis=2, kind="stable")
    off_s = np.take_along_axis(off, srt, 2)
    st_s = np.take_along_axis(start, srt, 2)
    dup = np.zeros_like(keep)
    dup[:, :, 1:] = (off_s[:, :, 1:] == off_s[:, :, :-1]) & (st_s[:, :, 1:] == st_s[:, :, :-1])
    undup = np.ones_like(keep)
    np.put_along_axis(undup, srt, ~dup, 2)
    keep &= undup
    s_idx, b_idx, _ = np.nonzero(keep)
    strand = s_idx.astype(np.int8)
    rs_raw, re_raw = start[keep], end[keep]
    ln = np.broadcast_to(lens, score.shape)[keep]
    pad = np.where(strand == 1, read_width - ln, 0)
    rs = rs_raw - pad
    re = re_raw - pad
    q_start = np.where(strand == 0, rs, ln - 1 - re)
    q_end = np.where(strand == 0, re, ln - 1 - rs)
    return MultiHits(
        read_id=b_idx.astype(np.int32),
        strand=strand,
        score=score[keep].astype(np.int32),
        matches=matches[keep].astype(np.int32),
        length=length[keep].astype(np.int32),
        q_start=q_start.astype(np.int32),
        q_end=q_end.astype(np.int32),
        ref_start=(off[keep] + rs_raw).astype(np.int64),
        ref_end=(off[keep] + re_raw).astype(np.int64),
    )


def align_to_reference_multi(
    seqs: np.ndarray,
    ref_codes: np.ndarray,
    cfg: Optional[AlignConfig] = None,
    min_score: int = 20,
    min_identity: float = 0.0,
    min_seg_len: int = 10,
    top_k: int = 8,
    stride: Optional[int] = None,
) -> MultiHits:
    """All-hits alignment against a small reference (one BLAT pass).

    Queries may be arbitrary consensus sequences; they are padded to a lane
    multiple internally.  ``stride`` is the seeding sample stride (pass the
    stage's StagePreset.step; defaults to cfg.seed_stride).
    """
    cfg = cfg or AlignConfig()
    seqs = np.asarray(seqs, dtype=np.int8)
    if seqs.ndim == 1:
        seqs = seqs[None]
    B0 = seqs.shape[0]
    # pad the batch to a multiple of 64 queries: bounds the set of compiled
    # shapes across calls with varying candidate counts
    Bp = -(-B0 // 64) * 64
    if Bp != B0:
        seqs = np.concatenate(
            [seqs, np.full((Bp - B0, seqs.shape[1]), PAD, np.int8)], axis=0)
    B, R = seqs.shape
    read_lens = (seqs != PAD).sum(axis=1).astype(np.int32)
    if stride is None:
        stride = getattr(cfg, "seed_stride", 1)
    W, W2 = _seed_matrix_cached(ref_codes, R, stride)
    seg = unstack_multi(np.asarray(_align_multi_core(
        seqs, jnp.asarray(ref_codes, jnp.int8), W, W2, top_k,
        cfg.match_score, cfg.mismatch_penalty, stride)))
    mh = _flatten_multi(seg, read_lens, B, top_k,
                        min_score, min_identity, min_seg_len, R)
    if Bp != B0:
        sel = mh.read_id < B0
        mh = MultiHits(**{f.name: getattr(mh, f.name)[sel]
                          for f in dataclasses.fields(MultiHits)})
    return mh


def align_to_reference(
    seqs: np.ndarray,
    ref_codes: np.ndarray,
    cfg: Optional[AlignConfig] = None,
    min_score: Optional[int] = None,
    min_identity: float = 0.0,
    min_seg_len: Optional[int] = None,
    top_k: Optional[int] = None,
    chunk: int = 8192,
    mesh=None,
) -> AlignmentResult:
    """Align a batch of encoded reads against one reference array.

    Host wrapper: chunks the batch to bound the (B, L+R-1) seeding matrix in
    HBM, runs the jitted core, applies the stage thresholds, and returns
    numpy struct-of-arrays.

    With ``mesh`` (jax.sharding.Mesh), each chunk is device_put with its batch
    axis sharded over the mesh's FIRST axis (dp) and the reference matrices
    replicated; XLA partitions the seeding matmul and extension over dp with
    no cross-device communication (the per-read records keep the batch
    sharding).  SURVEY §2.3 item 1: DP over read batches.
    """
    cfg = cfg or AlignConfig()
    if min_score is None:
        min_score = cfg.min_align_score
    if min_seg_len is None:
        min_seg_len = cfg.min_seg_len
    if top_k is None:
        top_k = cfg.top_diagonals
    seqs = np.asarray(seqs, dtype=np.int8)
    if seqs.ndim == 1:
        seqs = seqs[None]
    B, R = seqs.shape
    stride = getattr(cfg, "seed_stride", 1)
    batch_mult = 128
    rep_sh = dp_sh = None
    if mesh is not None:
        import math
        from jax.sharding import NamedSharding, PartitionSpec
        rep_sh = NamedSharding(mesh, PartitionSpec())
        dp_sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        dp = mesh.shape[mesh.axis_names[0]]
        batch_mult = math.lcm(128, dp)
        chunk = -(-chunk // batch_mult) * batch_mult
    W, W2 = _seed_matrix_cached(ref_codes, R, stride, sharding=rep_sh)
    ref = (jnp.asarray(ref_codes, dtype=jnp.int8) if mesh is None
           else jax.device_put(np.asarray(ref_codes, np.int8), rep_sh))
    # dispatch chunks asynchronously (the next chunk's host->device transfer
    # overlaps the previous chunk's compute); results are pulled in grouped
    # flushes of _FLUSH_CHUNKS (one relay round trip per group, not per
    # chunk), double-buffered so the device still has dispatched work queued
    # while a group transfers.  Live device buffers stay bounded at ~2 groups
    # however many chunks a multi-million-read batch splits into.
    puller = GroupedPuller(
        lambda a, n_real: {n: v[:n_real]
                           for n, v in unstack_result(a).items()})
    _push = puller.push

    for lo in range(0, B, chunk):
        sub = seqs[lo:lo + chunk]
        n_real = sub.shape[0]
        if n_real < chunk:
            # pad to the chunk size (or a lane multiple for small batches) to
            # bound the set of compiled shapes
            target = (chunk if B > chunk
                      else -(-n_real // batch_mult) * batch_mult)
            if target != n_real:
                sub = np.concatenate(
                    [sub, np.full((target - n_real, R), PAD, np.int8)], axis=0)
        if R % 2 == 0:
            from anchored_fusion_tpu.ops.encode import pack_nibbles
            packed = pack_nibbles(sub)
            if mesh is not None:
                packed = jax.device_put(packed, dp_sh)
            _push(n_real, _align_core_stacked_packed(
                packed, ref, W, W2, top_k, cfg.match_score,
                cfg.mismatch_penalty, stride, R))
        else:  # odd widths keep the raw-byte path (coords depend on R)
            if mesh is not None:
                sub = jax.device_put(sub, dp_sh)
            _push(n_real, _align_core_stacked(
                sub, ref, W, W2, top_k, cfg.match_score, cfg.mismatch_penalty,
                stride))
    outs = puller.finish()
    if not outs:
        z = lambda dt: np.zeros(0, dt)
        return AlignmentResult(z(np.int32), z(np.int8), z(np.int32), z(np.int32),
                               z(np.int64), z(np.int64), z(np.int32), z(np.int32),
                               z(np.int32), z(bool))
    cat = {n: np.concatenate([o[n] for o in outs]) for n in outs[0]}
    length = cat["length"]
    matches = cat["matches"]
    ident = matches / np.maximum(length, 1)
    mapped = (cat["score"] >= min_score) & (length >= min_seg_len) & (ident >= min_identity)
    res = AlignmentResult(
        score=cat["score"].astype(np.int32),
        strand=cat["strand"].astype(np.int8),
        read_start=cat["read_start"].astype(np.int32),
        read_end=cat["read_end"].astype(np.int32),
        ref_start=cat["ref_start"].astype(np.int64),
        ref_end=cat["ref_end"].astype(np.int64),
        matches=matches.astype(np.int32),
        length=length.astype(np.int32),
        second_score=cat["second_score"].astype(np.int32),
        mapped=mapped,
    )
    if getattr(cfg, "gapped_refine", False):
        from anchored_fusion_tpu.align.refine import refine_result
        res = refine_result(res, seqs, np.asarray(ref_codes), cfg,
                            min_score, min_identity, min_seg_len)
    return res


def orient_reads(seqs: np.ndarray, strands: np.ndarray) -> np.ndarray:
    """Apply per-read strand to raw read codes (SAM SEQ convention), batched.

    Reverse rows are left-aligned with an arithmetic index gather (no per-row
    roll: ``vmap(jnp.roll)``/py-loop rolls are the slow path on TPU/host):
    revcomp of a right-padded row leaves its PAD run in front, so row i of the
    output reads ``rc[(j + R - len_i) % R]``.
    """
    seqs = np.asarray(seqs)
    strands = np.asarray(strands)
    R = seqs.shape[1]
    rev_rows = np.nonzero(strands == 1)[0]
    out = seqs.copy()
    if len(rev_rows):
        rc = revcomp(seqs[rev_rows])
        lens = (seqs[rev_rows] != PAD).sum(axis=1)
        idx = (np.arange(R)[None, :] + (R - lens[:, None])) % R
        out[rev_rows] = np.take_along_axis(rc, idx, axis=1)
    return out


def classify_clips(res: AlignmentResult, read_lengths: np.ndarray, min_clip: int = 1):
    """Soft-clip classification of each alignment in the oriented read.

    Returns (kind, left_clip, right_clip) where kind is:
      0 = unmapped, 1 = full-length M, 2 = SM (left clip), 3 = MS (right clip),
      4 = SMS (both sides clipped — excluded by the reference's 2-op rule,
      functions.py:919).

    Mirrors ``deal_cigar`` normalization (functions.py:656-702): our segment
    records are already N/D/I/H-free, so the kind is decided purely by clip
    lengths.
    """
    read_lengths = np.asarray(read_lengths)
    left = res.read_start
    right = read_lengths - 1 - res.read_end
    left = np.where(res.mapped, left, 0)
    right = np.where(res.mapped, right, 0)
    kind = np.zeros(len(left), dtype=np.int8)
    lc = left >= min_clip
    rc = right >= min_clip
    kind = np.where(res.mapped & ~lc & ~rc, 1, kind)
    kind = np.where(res.mapped & lc & ~rc, 2, kind)
    kind = np.where(res.mapped & ~lc & rc, 3, kind)
    kind = np.where(res.mapped & lc & rc, 4, kind)
    return kind, left.astype(np.int32), right.astype(np.int32)
