"""Pallas TPU kernel: batched affine-gap Smith-Waterman forward pass.

The Pallas twin of ops/sw.py's ``sw_end``: a column wavefront (H/E column
state, F via log-doubling prefix-max over the read axis) that runs entirely
in VMEM, one grid program per batch tile.

Layout is transposed relative to the reference implementation: the BATCH is
the lane (last) dimension and read/window positions are sublanes, because
Mosaic only allows dynamic indexing on sublane dimensions — the per-column
loads ``winds_ref[pl.ds(j, 1), :]`` walk the window axis while every vector
op stays a full (R, TILE_B) VPU tile.  Mosaic also lacks cummax/argmax-int32
lowerings, so the prefix-max is a static log-step doubling and the argmax is
a min-index-attaining-max reduction.

Used for gapped refinement of reads whose ungapped Kadane segment leaves
mismatch clusters (indels); golden-tested against the numpy full DP via
ops/sw.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)


def _prefix_max_rows(x, height: int):
    """Inclusive running max along axis 0 via log-step doubling."""
    shift = 1
    while shift < height:
        pad = jnp.full((shift,) + x.shape[1:], NEG, x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:-shift]], axis=0))
        shift *= 2
    return x


def _sw_kernel(reads_ref, winds_ref, rvalid_ref, wvalid_ref,
               best_ref, endr_ref, endj_ref, H_ref, E_ref,
               *, match: int, mismatch: int, gap_open: int, gap_extend: int,
               W: int):
    """One batch tile, transposed layout: reads (R, TB), windows (W, TB).

    DP state (H/E columns, best trackers) lives in VMEM scratch refs rather
    than loop carries — vector-valued `fori_loop` carries currently trip a
    Mosaic relayout bug on replicated constant initializers.
    """
    R, TB = reads_ref.shape
    go = gap_open + gap_extend
    ge = gap_extend
    reads = reads_ref[:]
    rvalid = rvalid_ref[:]
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (R, TB), 0)

    H_ref[:] = jnp.zeros((R, TB), jnp.int32)
    E_ref[:] = jnp.full((R, TB), NEG, jnp.int32)
    best_ref[:] = jnp.zeros((1, TB), jnp.int32)
    endr_ref[:] = jnp.zeros((1, TB), jnp.int32)
    endj_ref[:] = jnp.zeros((1, TB), jnp.int32)

    def col(j, _):
        H_prev = H_ref[:]
        E_prev = E_ref[:]
        wcol = winds_ref[pl.ds(j, 1), :]                 # (1, TB)
        wval = wvalid_ref[pl.ds(j, 1), :]
        eq = (reads == wcol) & (rvalid > 0) & (reads < 4) & (wval > 0)
        s = jnp.where(eq, jnp.int32(match), jnp.int32(-mismatch))
        s = jnp.where((rvalid > 0) & (wval > 0), s, jnp.int32(NEG))
        E = jnp.maximum(H_prev - go, E_prev - ge)
        diag = jnp.concatenate(
            [jnp.zeros((1, TB), jnp.int32), H_prev[:-1]], axis=0)
        HnoF = jnp.maximum(jnp.maximum(diag + s, E), 0)
        # F via prefix-max: source H[k] reaching row i costs go + (i-k)*ge
        g = HnoF - go + (idx_r + 1) * ge
        gmax = _prefix_max_rows(g, R)
        gshift = jnp.concatenate(
            [jnp.full((1, TB), NEG, jnp.int32), gmax[:-1]], axis=0)
        F = gshift - idx_r * ge
        H = jnp.maximum(HnoF, F)
        col_best = jnp.max(H, axis=0, keepdims=True)     # (1, TB)
        col_best_r = jnp.min(
            jnp.where(H == col_best, idx_r, jnp.int32(2 ** 30)),
            axis=0, keepdims=True)
        improve = col_best > best_ref[:]
        best_ref[:] = jnp.where(improve, col_best, best_ref[:])
        endr_ref[:] = jnp.where(improve, col_best_r, endr_ref[:])
        endj_ref[:] = jnp.where(improve, j, endj_ref[:])
        H_ref[:] = H
        E_ref[:] = E
        return 0

    jax.lax.fori_loop(0, W, col, 0)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "tile_b"))
def _sw_end_pallas_t(reads_t, winds_t, rvalid_t, wvalid_t,
                     match: int, mismatch: int, gap_open: int,
                     gap_extend: int, tile_b: int):
    R, B = reads_t.shape
    W = winds_t.shape[0]
    grid = (pl.cdiv(B, tile_b),)
    kernel = functools.partial(
        _sw_kernel, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, W=W)
    spec_r = pl.BlockSpec((R, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((W, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_r, spec_w, spec_r, spec_w],
        out_specs=(spec_o, spec_o, spec_o),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, tile_b), jnp.int32),
            pltpu.VMEM((R, tile_b), jnp.int32),
        ],
    )(reads_t, winds_t, rvalid_t, wvalid_t)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "tile_b"))
def _sw_align_fused(reads8, winds8, match: int, mismatch: int,
                    gap_open: int, gap_extend: int, tile_b: int):
    """Forward + reverse SW in ONE dispatch; returns a (5, B) int32 stack.

    Rows: [score, end_read, end_win, start_read, start_win].  The reverse
    pass's inputs (each pair's prefix up to the forward end point, reversed)
    are built on device with an arithmetic gather, so the whole
    start-coordinate recovery costs one host round trip instead of three
    (fwd dispatch, host reversal, reverse dispatch) — on the axon relay each
    round trip is ~22 ms, which dominated the refine stage.  Inputs stay
    int8 across the link (4x smaller than the old pre-transposed int32).
    """
    B, R = reads8.shape
    W = winds8.shape[1]
    PAD8 = jnp.int8(5)

    def run(r8, w8):
        r_t = r8.T.astype(jnp.int32)
        w_t = w8.T.astype(jnp.int32)
        rv_t = (r8 != PAD8).T.astype(jnp.int32)
        wv_t = (w8 != PAD8).T.astype(jnp.int32)
        return _sw_end_pallas_t(r_t, w_t, rv_t, wv_t, match, mismatch,
                                gap_open, gap_extend, tile_b)

    best, er, ej = run(reads8, winds8)
    er_, ej_ = er[0], ej[0]
    # reversed prefixes: out[i, j] = in[i, end_i - j] for j <= end_i else PAD
    idx_r = er_[:, None] - jnp.arange(R, dtype=jnp.int32)[None, :]
    reads_r = jnp.where(
        idx_r >= 0,
        jnp.take_along_axis(reads8, jnp.maximum(idx_r, 0), axis=1), PAD8)
    idx_w = ej_[:, None] - jnp.arange(W, dtype=jnp.int32)[None, :]
    winds_r = jnp.where(
        idx_w >= 0,
        jnp.take_along_axis(winds8, jnp.maximum(idx_w, 0), axis=1), PAD8)
    _, sr_rev, sj_rev = run(reads_r, winds_r)
    return jnp.stack([best[0], er_, ej_, er_ - sr_rev[0], ej_ - sj_rev[0]])


def sw_align_fused_pallas(reads, windows, match: int = 1, mismatch: int = 4,
                          gap_open: int = 6, gap_extend: int = 1,
                          tile_b: int = 128):
    """One-dispatch forward+reverse SW; returns dict like ops.sw.sw_align.

    PAD-validity convention (valid = code != 5); same coordinates as running
    sw_end_pallas twice with host-side prefix reversal in between.
    """
    B, R = reads.shape
    Bp = -(-B // tile_b) * tile_b
    def pad(x):
        x = np.asarray(x, np.int8)
        if Bp == len(x):
            return x
        return np.concatenate(
            [x, np.full((Bp - len(x),) + x.shape[1:], 5, np.int8)], axis=0)
    st = np.asarray(_sw_align_fused(pad(reads), pad(windows), match,
                                    mismatch, gap_open, gap_extend,
                                    min(tile_b, Bp)))
    return {
        "score": st[0, :B],
        "end_read": st[1, :B],
        "end_win": st[2, :B],
        "start_read": st[3, :B],
        "start_win": st[4, :B],
    }


def sw_end_pallas(reads, windows, read_valid, window_valid,
                  match: int = 1, mismatch: int = 4, gap_open: int = 6,
                  gap_extend: int = 1, tile_b: int = 128):
    """Forward local DP on TPU via Pallas; (best_score, end_read, end_win).

    Same contract as ops.sw.sw_end; the batch is padded to the lane tile.
    """
    B, R = reads.shape
    Bp = -(-B // tile_b) * tile_b
    def pad(x, fill):
        x = np.asarray(x)
        if Bp == B:
            return x
        return np.concatenate(
            [x, np.full((Bp - B,) + x.shape[1:], fill, x.dtype)], axis=0)
    r_t = jnp.asarray(pad(reads, 5).T).astype(jnp.int32)
    w_t = jnp.asarray(pad(windows, 5).T).astype(jnp.int32)
    rv_t = jnp.asarray(pad(read_valid, False).T).astype(jnp.int32)
    wv_t = jnp.asarray(pad(window_valid, False).T).astype(jnp.int32)
    best, endr, endj = _sw_end_pallas_t(
        r_t, w_t, rv_t, wv_t, match, mismatch, gap_open, gap_extend,
        min(tile_b, Bp))
    return best[0, :B], endr[0, :B], endj[0, :B]
