"""Pallas TPU kernel: batched affine-gap Smith-Waterman forward pass.

The Pallas twin of ops/sw.py's `sw_end`: the anti-diagonal-free column
wavefront (H/E column state, F via prefix-max over the read axis) runs
entirely in VMEM with one grid program per batch tile, iterating reference
columns with `fori_loop`.  Every step is an (TILE_B, R) vector op on the VPU;
the gathered windows and reads stream HBM -> VMEM through the BlockSpec
pipeline.

Used for gapped refinement of reads whose ungapped Kadane segment leaves
mismatch clusters (indels) — rare on Illumina data, so correctness and VMEM
residency matter more than absolute throughput here; the golden tests pin it
against the numpy full DP and the lax.scan implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)


def _sw_kernel(reads_ref, winds_ref, rvalid_ref, wvalid_ref,
               best_ref, endr_ref, endj_ref,
               *, match: int, mismatch: int, gap_open: int, gap_extend: int,
               W: int):
    """One batch tile: reads (TB, R), windows (TB, W) -> best/end coords (TB,)."""
    TB, R = reads_ref.shape
    go = gap_open + gap_extend
    ge = gap_extend
    reads = reads_ref[:]
    rvalid = rvalid_ref[:]
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (TB, R), 1)

    def col(j, carry):
        H_prev, E_prev, best, best_r, best_j = carry
        wcol = jax.lax.dynamic_slice(winds_ref[:], (0, j), (TB, 1))
        wval = jax.lax.dynamic_slice(wvalid_ref[:], (0, j), (TB, 1))
        eq = (reads == wcol) & rvalid & (reads < 4) & (wval > 0)
        s = jnp.where(eq, jnp.int32(match), jnp.int32(-mismatch))
        s = jnp.where(rvalid & (wval > 0), s, jnp.int32(NEG))
        E = jnp.maximum(H_prev - go, E_prev - ge)
        diag = jnp.concatenate(
            [jnp.zeros((TB, 1), jnp.int32), H_prev[:, :-1]], axis=1)
        HnoF = jnp.maximum(jnp.maximum(diag + s, E), 0)
        # F via prefix-max: source H[k] reaching row i costs go + (i-k)*ge
        g = HnoF - go + (idx_r + 1) * ge
        gmax = jax.lax.cummax(g, axis=1)
        gshift = jnp.concatenate(
            [jnp.full((TB, 1), NEG, jnp.int32), gmax[:, :-1]], axis=1)
        F = gshift - idx_r * ge
        H = jnp.maximum(HnoF, F)
        col_best_r = jnp.argmax(H, axis=1).astype(jnp.int32)
        col_best = jnp.max(H, axis=1)
        improve = col_best > best
        best = jnp.where(improve, col_best, best)
        best_r = jnp.where(improve, col_best_r, best_r)
        best_j = jnp.where(improve, j, best_j)
        return H, E, best, best_r, best_j

    H0 = jnp.zeros((TB, R), jnp.int32)
    E0 = jnp.full((TB, R), NEG, jnp.int32)
    z = jnp.zeros((TB,), jnp.int32)
    H, E, best, best_r, best_j = jax.lax.fori_loop(
        0, W, col, (H0, E0, z, z, z))
    best_ref[:] = best
    endr_ref[:] = best_r
    endj_ref[:] = best_j


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "tile_b"))
def sw_end_pallas(reads, windows, read_valid, window_valid,
                  match: int = 1, mismatch: int = 4, gap_open: int = 6,
                  gap_extend: int = 1, tile_b: int = 128):
    """Forward local DP on TPU via Pallas; (best_score, end_read, end_win)."""
    B, R = reads.shape
    W = windows.shape[1]
    TB = min(tile_b, B)
    grid = (pl.cdiv(B, TB),)
    kernel = functools.partial(
        _sw_kernel, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, W=W)
    spec_r = pl.BlockSpec((TB, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((TB, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((TB,), lambda i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_r, spec_w, spec_r, spec_w],
        out_specs=(spec_o, spec_o, spec_o),
        out_shape=(
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
    )(reads.astype(jnp.int32), windows.astype(jnp.int32),
      read_valid.astype(jnp.int32), window_valid.astype(jnp.int32))
    return out
