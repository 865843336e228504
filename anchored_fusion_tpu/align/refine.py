"""Gapped refinement of ungapped alignments.

The Kadane extension is exact for SNP-only reads; a read with an indel splits
its diagonal and the best ungapped segment covers only the longer side,
under-reporting the aligned span (bwa-mem would bridge the gap with an
affine-gap extension, O6/E1).  This post-pass re-aligns the *suspicious*
minority — mapped reads whose identity or span suggests a bridgeable gap —
with the affine Smith-Waterman (ops/sw.py, ops/sw_pallas.py) over a widened
window around their diagonal, and adopts the gapped coordinates when they
score strictly higher.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from anchored_fusion_tpu.config import AlignConfig
from anchored_fusion_tpu.ops.encode import PAD
from anchored_fusion_tpu.ops import sw
from anchored_fusion_tpu.align.aligner import AlignmentResult


def _sw_align_fast(reads, wins, rv, wv, cfg: AlignConfig):
    """Forward + reverse SW end-finding with the fastest available backend.

    On a TPU backend the Pallas kernel runs both passes (the lax.scan
    implementation takes minutes to *compile* through the remote TPU
    toolchain); elsewhere the scan path is used.  The reverse pass re-runs
    the forward DP on host-prepared reversed prefixes — start = end - rev_end.
    """
    import jax as _jax
    use_pallas = _jax.default_backend() == "tpu"
    kw = dict(match=cfg.match_score, mismatch=cfg.mismatch_penalty,
              gap_open=cfg.gap_open, gap_extend=cfg.gap_extend)

    def fwd(r, w, rvv, wvv):
        if use_pallas:
            from anchored_fusion_tpu.ops.sw_pallas import sw_end_pallas
            b, er, ej = sw_end_pallas(r, w, rvv, wvv, **kw)
            return np.asarray(b), np.asarray(er), np.asarray(ej)
        b, er, ej = sw.sw_end(jnp.asarray(r), jnp.asarray(w),
                              jnp.asarray(rvv), jnp.asarray(wvv), **kw)
        return np.asarray(b), np.asarray(er), np.asarray(ej)

    score, er, ej = fwd(reads, wins, rv, wv)
    n, R = reads.shape
    W = wins.shape[1]
    reads_r = np.full_like(reads, PAD)
    wins_r = np.full_like(wins, PAD)
    for i in range(n):
        reads_r[i, :er[i] + 1] = reads[i, :er[i] + 1][::-1]
        wins_r[i, :ej[i] + 1] = wins[i, :ej[i] + 1][::-1]
    score2, sr_rev, sj_rev = fwd(reads_r, wins_r, reads_r != PAD, wins_r != PAD)
    return {
        "score": score,
        "start_read": er - sr_rev,
        "end_read": er,
        "start_win": ej - sj_rev,
        "end_win": ej,
    }


def select_for_refinement(res: AlignmentResult, read_lens: np.ndarray,
                          min_score: int = 20, max_identity: float = 0.97,
                          min_tail: int = 8) -> np.ndarray:
    """Indices worth a gapped pass: mapped-ish but imperfect alignments that
    still leave >= min_tail unaligned bases on some side."""
    lens = np.asarray(read_lens)
    tail = (res.read_start + (lens - 1 - res.read_end))
    cand = (res.score >= min_score) & (
        (res.identity < max_identity) | (tail >= min_tail))
    return np.nonzero(cand)[0]


def refine_alignments(
    res: AlignmentResult,
    oriented_seqs: np.ndarray,     # (N, R) strand-applied reads
    read_lens: np.ndarray,
    ref_codes: np.ndarray,
    cfg: Optional[AlignConfig] = None,
    band: Optional[int] = None,
) -> AlignmentResult:
    """Return a copy of ``res`` with gapped coordinates where SW wins."""
    cfg = cfg or AlignConfig()
    band = band or cfg.band_half_width
    sel = select_for_refinement(res, read_lens, min_score=cfg.min_align_score // 2)
    if len(sel) == 0:
        return res
    R = oriented_seqs.shape[1]
    W = R + 2 * band
    L = len(ref_codes)
    refp = np.concatenate([np.full(W, PAD, np.int8), np.asarray(ref_codes),
                           np.full(W, PAD, np.int8)])
    # window start so the current segment sits centered with +-band slack
    diag = res.ref_start[sel] - res.read_start[sel]
    win_start = diag - band
    n = len(sel)
    n_pad = -(-n // 64) * 64
    reads = np.full((n_pad, R), PAD, np.int8)
    wins = np.full((n_pad, W), PAD, np.int8)
    reads[:n] = oriented_seqs[sel]
    for i, ws in enumerate(win_start):
        wins[i] = refp[W + int(ws): 2 * W + int(ws)]
    rv = reads != PAD
    wv = wins != PAD
    out = _sw_align_fast(reads, wins, rv, wv, cfg)
    score = np.asarray(out["score"])[:n]
    sr = np.asarray(out["start_read"])[:n]
    er = np.asarray(out["end_read"])[:n]
    sj = np.asarray(out["start_win"])[:n]
    ej = np.asarray(out["end_win"])[:n]
    better = score > res.score[sel]
    idx = sel[better]
    new = AlignmentResult(**{f: np.array(getattr(res, f))
                             for f in ("score", "strand", "read_start",
                                       "read_end", "ref_start", "ref_end",
                                       "matches", "length", "second_score",
                                       "mapped")})
    new.score[idx] = score[better]
    new.read_start[idx] = sr[better]
    new.read_end[idx] = er[better]
    new.ref_start[idx] = win_start[better] + sj[better]
    new.ref_end[idx] = win_start[better] + ej[better]
    new.length[idx] = er[better] - sr[better] + 1
    # identity bookkeeping: SW score = matches - penalties; keep a
    # conservative matches estimate (>= score)
    new.matches[idx] = np.maximum(new.matches[idx], score[better])
    new.ref_start[idx] = np.clip(new.ref_start[idx], 0, L - 1)
    new.ref_end[idx] = np.clip(new.ref_end[idx], 0, L - 1)
    return new
