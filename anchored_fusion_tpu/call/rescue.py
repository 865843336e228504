"""Multi-mapper rescue filter: drop clipped reads the linear genome explains.

Re-design of ``del_too_many_reads`` (functions.py:705-768): the reference
re-aligns every 2-op soft-clipped anchored read to the whole genome with bwa
and drops reads whose genome alignment is a single full-length match
(:749-750) or whose M-run straddles the anchor-side M-run end by >20% of its
length on both sides (:751-756).  Here the genome hits come from the k-mer
engine in the anchor-oriented query frame (MultiHits q-coordinates), so the
straddle test is a direct interval comparison.

Note the reference's straddle test keys on the anchor M-run's *end* offset;
for SM reads (anchor match is the read suffix) the condition can never fire,
leaving only the full-length test — reproduced faithfully here.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from anchored_fusion_tpu.config import CallConfig


def rescue_filter(
    n_reads: int,
    anchor_m_start: Sequence[int],   # anchor M-run start in oriented read (0-based)
    anchor_m_len: Sequence[int],     # anchor M-run length
    read_lens: Sequence[int],
    hits,                            # MultiHits of the oriented full reads vs genome
    cfg: CallConfig | None = None,
) -> np.ndarray:
    """Boolean keep-mask over the clipped reads."""
    cfg = cfg or CallConfig()
    frac = cfg.rescue_overlap_frac
    bad = np.zeros(n_reads, dtype=bool)
    for h in range(len(hits.read_id)):
        r = int(hits.read_id[h])
        if bad[r]:
            continue
        qs = int(hits.q_start[h])
        qe1 = int(hits.q_end[h]) + 1           # exclusive
        L = int(read_lens[r])
        if qs == 0 and qe1 >= L:
            bad[r] = True                       # single full-length match
            continue
        a1 = int(anchor_m_start[r]) + int(anchor_m_len[r])  # exclusive end
        ml = int(anchor_m_len[r])
        if qs < a1 - ml * frac and qe1 > a1 + ml * frac:
            bad[r] = True                       # junction straddle
    return ~bad
