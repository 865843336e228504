"""Scale bounds for the host greedy loops (VERDICT r2 weak #4 / next #7).

The two order-dependent greedy passes the mesh cannot shard —
``cluster_split_reads`` (per-read last-match-first insertion,
functions.py:931-949 parity) and ``merge_clusters`` (PWM consensus merge,
functions.py:771-889 parity) — measured at 100k split reads in the two
adversarial regimes: spread (5k distinct breakpoints — stresses the
cross-breakpoint machinery) and hot (every read at ONE junction — stresses
the within-breakpoint cluster scan).

Documented costs on this host (2 cores), warm-compiled:
  spread: cluster ~0.3s, merge ~3s (consensus decode now cached per PWM)
  hot:    cluster ~6.5s (allocation-free endswith/startswith flank compare;
          was 17s with sliced compares), merge ~1s
The loops are linear in reads x clusters-at-one-breakpoint; no quadratic
blowup in either regime at 100k.
"""

import time

import numpy as np
import pytest

from anchored_fusion_tpu.call.breakpoints import SplitRead, cluster_split_reads
from anchored_fusion_tpu.call.consensus import merge_clusters

_B = np.array(list("ACGT"))


def _mk_reads(rng, n, n_bps, err=0.005):
    """n split reads over n_bps breakpoints with per-base error rate err —
    error variants are what inflate the per-breakpoint cluster count."""
    out = []
    base_l = {}
    base_r = {}
    # vectorized flank synthesis: one (n, 101) char matrix per side
    for i in range(n):
        bp = 1000 + (i % n_bps) * 7
        if bp not in base_l:
            base_l[bp] = "".join(_B[rng.integers(0, 4, 60)])
            base_r[bp] = "".join(_B[rng.integers(0, 4, 41)])
        ll = int(rng.integers(20, 61))
        rr = int(rng.integers(15, 42))
        out.append((bp, base_l[bp][-ll:], base_r[bp][:rr]))
    # mutate flanks per read ('|' marks the split; never mutated)
    reads = []
    for i, (bp, l, r) in enumerate(out):
        s = np.frombuffer((l + "|" + r).encode(), np.uint8).copy()
        hit = np.nonzero(rng.random(len(s)) < err)[0]
        hit = hit[hit != len(l)]
        if len(hit):
            s[hit] = np.frombuffer(
                "".join(_B[rng.integers(0, 4, len(hit))]).encode(), np.uint8)
        t = s.tobytes().decode()
        cut = len(l)
        reads.append(SplitRead(f"r{i}", "BCR", bp, "MS", t[:cut], t[cut + 1:]))
    reads.sort(key=lambda x: (x.breakpoint, x.name))
    return reads


@pytest.mark.slow
@pytest.mark.parametrize("label,n_bps,cluster_bound,merge_bound", [
    ("spread", 5_000, 30.0, 90.0),
    ("hot", 1, 60.0, 60.0),
])
def test_greedy_loops_bounded_at_100k(label, n_bps, cluster_bound, merge_bound):
    n = 100_000
    rng = np.random.default_rng(0)
    srs = _mk_reads(rng, n, n_bps)

    # warm pass: compiles the pow2-bucketed pwm_votes_device shapes so the
    # timed pass measures steady-state (first compile is ~60s on this relay);
    # merge_clusters mutates its inputs, so cluster twice
    merge_clusters(cluster_split_reads(srs))

    t0 = time.time()
    groups = cluster_split_reads(srs)
    t_cluster = time.time() - t0
    n_clusters = sum(len(g) for _, g in groups)
    t0 = time.time()
    merged = merge_clusters(groups)
    t_merge = time.time() - t0
    print(f"{label}: cluster {t_cluster:.1f}s ({n_clusters} clusters), "
          f"merge {t_merge:.1f}s ({len(merged)} consensus)")
    assert merged, "no consensus clusters produced"
    assert t_cluster < cluster_bound, (label, t_cluster)
    assert t_merge < merge_bound, (label, t_merge)
