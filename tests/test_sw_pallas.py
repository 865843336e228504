import numpy as np
import pytest
import jax
import jax.numpy as jnp

from anchored_fusion_tpu.ops import sw
from anchored_fusion_tpu.ops.sw_pallas import sw_end_pallas


def _runs_pallas():
    # interpret mode works everywhere; compiled mode needs a TPU backend
    return True


@pytest.mark.parametrize("trial", range(3))
def test_pallas_sw_matches_scan_sw(rng, trial):
    B, R, W = 16, 32, 48
    reads = rng.integers(0, 4, (B, R)).astype(np.int8)
    wins = rng.integers(0, 4, (B, W)).astype(np.int8)
    # embed noisy read fragments
    for b in range(B):
        o = int(rng.integers(0, W - 20))
        wins[b, o:o + 16] = reads[b, 8:24]
        if (b + trial) % 3 == 0:
            wins[b, o + 5] = (wins[b, o + 5] + 1) % 4  # SNP
    rv = jnp.asarray(reads != 5)
    wv = jnp.asarray(np.ones((B, W), bool))
    want = sw.sw_end(jnp.asarray(reads), jnp.asarray(wins), rv, wv)
    try:
        got = sw_end_pallas(jnp.asarray(reads), jnp.asarray(wins), rv, wv)
    except Exception:
        # fall back to the Pallas interpreter (no TPU in CI)
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            got = sw_end_pallas(jnp.asarray(reads), jnp.asarray(wins), rv, wv)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    # end coordinates must agree wherever the best score is unique
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
