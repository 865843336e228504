"""Affine-gap Smith-Waterman over gathered reference windows.

Gapped refinement of the ungapped Kadane segments: replaces bwa-mem's
seed-extension (affine gaps O=6 E=1, match 1, mismatch 4 — bwa defaults) for
the minority of reads whose best diagonal leaves residual mismatch clusters
(indels).  The DP runs as a `lax.scan` over reference-window columns with a
(B, R) column state — every step is a full-lane VPU op, batched over reads —
and recovers alignment *start* coordinates with a second pass over the
reversed sequences instead of backtracking (no data-dependent control flow,
no backtrack matrix in HBM).

A Pallas double-buffered variant of the same wavefront lives in
ops/sw_pallas.py; both are golden-tested against a numpy full DP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = jnp.int32(-(2 ** 28))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_extend"))
def sw_end(reads: jax.Array, windows: jax.Array, read_valid: jax.Array,
           window_valid: jax.Array, match: int = 1, mismatch: int = 4,
           gap_open: int = 6, gap_extend: int = 1):
    """Forward local DP; returns (best_score, end_read, end_win) per pair.

    Args:
      reads:        (B, R) int8.
      windows:      (B, W) int8 gathered reference windows.
      read_valid:   (B, R) bool.
      window_valid: (B, W) bool.
    """
    B, R = reads.shape
    W = windows.shape[1]
    go = gap_open + gap_extend  # cost of first gap base
    ge = gap_extend

    def col(carry, xs):
        H_prev, E_prev, best, best_r, best_j = carry
        wcol, wval, j = xs
        # substitution scores for this column against every read position
        eq = (reads == wcol[:, None]) & read_valid & (reads < 4) & wval[:, None]
        s = jnp.where(eq, jnp.int32(match), jnp.int32(-mismatch))
        s = jnp.where(read_valid & wval[:, None], s, NEG)
        # E: gap in read (skip window column) — horizontal move
        E = jnp.maximum(H_prev - go, E_prev - ge)
        # diag: H_prev shifted down by one read position
        diag = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H_prev[:, :-1]], axis=1)
        HnoF = jnp.maximum(jnp.maximum(diag + s, E), 0)
        # F: gap in window (skip read base) — vertical move, needs a scan
        # down the read axis.  Compute via prefix max of (HnoF[k] + k*ge).
        idx = jnp.arange(R, dtype=jnp.int32)[None, :]
        # source H[k] reaching row i costs gap_open + (i-k)*ge in total:
        # g[k] = H[k] - go + (k+1)*ge  =>  F[i] = max_{k<i} g[k] - i*ge.
        g = HnoF - go + (idx + 1) * ge
        gmax = jax.lax.cummax(g, axis=1)
        gmax_shift = jnp.concatenate([jnp.full((B, 1), NEG), gmax[:, :-1]], axis=1)
        F = gmax_shift - idx * ge
        H = jnp.maximum(HnoF, F)
        # track global best
        col_best_r = jnp.argmax(H, axis=1).astype(jnp.int32)
        col_best = jnp.take_along_axis(H, col_best_r[:, None], axis=1)[:, 0]
        improve = col_best > best
        best = jnp.where(improve, col_best, best)
        best_r = jnp.where(improve, col_best_r, best_r)
        best_j = jnp.where(improve, j, best_j)
        return (H, E, best, best_r, best_j), None

    H0 = jnp.zeros((B, R), jnp.int32)
    E0 = jnp.full((B, R), NEG)
    init = (H0, E0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32))
    (H, E, best, best_r, best_j), _ = jax.lax.scan(
        col, init,
        (windows.T, window_valid.T, jnp.arange(W, dtype=jnp.int32)))
    del H, E
    return best, best_r, best_j


def sw_align(reads, windows, read_valid, window_valid, match=1, mismatch=4,
             gap_open=6, gap_extend=1):
    """Full local alignment: returns dict with score and inclusive coordinates
    (start_read, end_read, start_win, end_win) per pair.

    Start coordinates come from running the same forward DP on the reversed
    sequences, masked beyond the forward end point.
    """
    B, R = reads.shape
    W = windows.shape[1]
    score, er, ej = sw_end(reads, windows, read_valid, window_valid,
                           match, mismatch, gap_open, gap_extend)
    # Reverse, keeping only prefix up to the end point.
    pos_r = jnp.arange(R)[None, :]
    pos_j = jnp.arange(W)[None, :]
    rv = read_valid & (pos_r <= er[:, None])
    wv = window_valid & (pos_j <= ej[:, None])
    # Align so reversed position 0 is the forward end point: roll each row.
    def rev_roll(x, end):
        # x[:, :end+1] reversed then padded — implemented as flip + roll.
        flipped = jnp.flip(x, axis=1)
        shift = x.shape[1] - 1 - end
        return jax.vmap(lambda row, s: jnp.roll(row, -s))(flipped, shift)
    reads_r = rev_roll(reads, er)
    rv_r = rev_roll(rv, er)
    win_r = rev_roll(windows, ej)
    wv_r = rev_roll(wv, ej)
    score2, sr_rev, sj_rev = sw_end(reads_r, win_r, rv_r, wv_r,
                                    match, mismatch, gap_open, gap_extend)
    start_read = er - sr_rev
    start_win = ej - sj_rev
    return {
        "score": score,
        "score_rev": score2,
        "start_read": start_read,
        "end_read": er,
        "start_win": start_win,
        "end_win": ej,
    }
