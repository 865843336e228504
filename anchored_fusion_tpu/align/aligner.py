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
# (array identity, length, width) so repeated calls against the same anchor /
# candidate reference reuse the device-resident im2col.
_SEED_CACHE: dict = {}


def _seed_matrix_cached(ref_codes: np.ndarray, read_len: int):
    key = (id(ref_codes), int(np.asarray(ref_codes).shape[0]), read_len)
    W = _SEED_CACHE.get(key)
    if W is None:
        W = build_seed_matrix(np.asarray(ref_codes), read_len)
        if len(_SEED_CACHE) > 16:
            _SEED_CACHE.clear()
        _SEED_CACHE[key] = W
    return W


def both_strands(reads: jax.Array):
    """(B, R) -> (2B, R): forward then reverse-complement halves.

    Reverse-complemented rows are LEFT-ALIGNED: plain revcomp of a padded row
    moves the PAD run to the front, which would shift every oriented-read
    coordinate by the pad width.  Gather each row back so position 0 is the
    first real base (SAM SEQ convention).
    """
    B, R = reads.shape
    lens = jnp.sum(reads != PAD, axis=1)
    rc = revcomp(reads)
    gidx = (jnp.arange(R, dtype=jnp.int32)[None, :] + (R - lens)[:, None]) % R
    rc = jnp.take_along_axis(rc, gidx, axis=1)
    return jnp.concatenate([reads, rc], axis=0)


def extend_diagonals(flat: jax.Array, ref: jax.Array, offs: jax.Array,
                     match: int, mismatch: int):
    """Kadane extension of candidate diagonals.

    Args:
      flat: (N, R) oriented reads.
      ref:  (L,) reference codes.
      offs: (N, k) candidate ref offsets of read position 0 per read.
    Returns dict of (N,): score, read_start/end, matches, length, off,
    second (score of the runner-up candidate).
    """
    N, R = flat.shape
    L = ref.shape[0]
    k = offs.shape[1]
    pos = offs[:, :, None] + jnp.arange(R, dtype=jnp.int32)[None, None, :]
    valid_ref = (pos >= 0) & (pos < L)
    win = ref[jnp.clip(pos, 0, L - 1)]                     # (N, k, R)
    read_valid = (flat != PAD)[:, None, :]
    valid = valid_ref & read_valid
    sc, ism = kadane.segment_scores(
        jnp.broadcast_to(flat[:, None, :], win.shape), win, valid,
        match=match, mismatch=mismatch)
    seg = kadane.best_segment(sc, ism)                     # dict of (N, k)
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


def fold_strands(cand: dict, B: int):
    """Fold the (2B,) forward/revcomp candidate halves into per-read records."""
    fwd = {n: v[:B] for n, v in cand.items()}
    rev = {n: v[B:] for n, v in cand.items()}
    use_rev = rev["score"] > fwd["score"]
    pick = lambda n: jnp.where(use_rev, rev[n], fwd[n])
    out = {
        "score": pick("score"),
        "strand": use_rev.astype(jnp.int8),
        "read_start": pick("rs"),
        "read_end": pick("re"),
        "matches": pick("mt"),
        "length": pick("ln"),
        "second_score": jnp.maximum(
            jnp.where(use_rev, rev["second"], fwd["second"]),
            jnp.where(use_rev, fwd["score"], rev["score"])),
    }
    off_best = pick("off")
    out["ref_start"] = off_best + out["read_start"]
    out["ref_end"] = off_best + out["read_end"]
    return out


@functools.partial(jax.jit, static_argnames=("k", "match", "mismatch"))
def _align_core(reads: jax.Array, ref: jax.Array, seed_matrix: jax.Array,
                k: int, match: int, mismatch: int):
    """Both-strand top-k diagonal seeding + Kadane extension.

    Args:
      reads:       (B, R) int8.
      ref:         (L,) int8.
      seed_matrix: (R*4, L+R-1) prebuilt reference patch matrix.
    Returns per-read dict (all (B,)): score, strand, read_start, read_end,
      ref_start, ref_end, matches, length, second_score.
    """
    B, R = reads.shape
    flat = both_strands(reads)                             # (2B, R)
    counts = diag_match_counts_w(flat, seed_matrix)        # (2B, L+R-1)
    _, idx = jax.lax.top_k(counts, k)                      # (2B, k)
    offs = idx - (R - 1)                                   # ref offset of read pos 0
    cand = extend_diagonals(flat, ref, offs, match, mismatch)
    return fold_strands(cand, B)


def align_to_reference(
    seqs: np.ndarray,
    ref_codes: np.ndarray,
    cfg: Optional[AlignConfig] = None,
    min_score: Optional[int] = None,
    min_identity: float = 0.0,
    min_seg_len: Optional[int] = None,
    top_k: Optional[int] = None,
    chunk: int = 8192,
) -> AlignmentResult:
    """Align a batch of encoded reads against one reference array.

    Host wrapper: chunks the batch to bound the (B, L+R-1) seeding matrix in
    HBM, runs the jitted core, applies the stage thresholds, and returns
    numpy struct-of-arrays.
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
    ref = jnp.asarray(ref_codes, dtype=jnp.int8)
    W = _seed_matrix_cached(ref_codes, R)
    outs = []
    for lo in range(0, B, chunk):
        sub = seqs[lo:lo + chunk]
        n_real = sub.shape[0]
        if n_real < chunk and B > chunk:
            # pad the tail chunk to avoid a recompile for its odd shape
            sub = np.concatenate(
                [sub, np.full((chunk - n_real, R), PAD, np.int8)], axis=0)
        res = _align_core(jnp.asarray(sub), ref, W, top_k,
                          cfg.match_score, cfg.mismatch_penalty)
        outs.append({n: np.asarray(v)[:n_real] for n, v in res.items()})
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
    return AlignmentResult(
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
