"""Exon-walk windows: spliced +-length bp windows around a genomic position.

Behavior-parity re-derivation of the reference's ``find_positions``
(functions.py:1331-1391): from the exon containing ``pos``, collect up to
``length`` bp of *exonic* sequence on each side, hopping introns and skipping
interleaved rows of other genes.  The two directions are one symmetric
routine here (``_half_window``) instead of the reference's twin loops; output
is the identical structure — 0-based half-open (start, end) intervals in
genomic order with an ('H', '') sentinel between the upstream and downstream
halves — so every consumer (block expansion functions.py:490-495, negative
mining :1553-1568, filter inputs :1663-1674) sees the same contract.
Golden-tested against the reference function itself in
tests/test_call_units.py::test_find_positions_matches_reference.

Semantics preserved exactly, including the asymmetry that the left window
EXCLUDES ``pos`` while the right window INCLUDES it, and that the walk
re-checks gene/containment at every row (so the one-step-left quirk of
``Find_exon`` self-corrects).
"""

from __future__ import annotations

from typing import List, Tuple

from anchored_fusion_tpu.annotate.exon_index import ExonIndex


def _half_window(dic: list, gene_name: str, exon0: int, pos0: int,
                 budget: int, step: int) -> List[Tuple[int, int]]:
    """Collect ``budget`` exonic bases walking rows by ``step`` (+-1).

    ``pos0`` is the first base to take (1-based, inclusive).  Intervals come
    out in walk order as 0-based half-open (start, end); leftward walks
    therefore produce them right-to-left (the caller reverses).
    """
    out: List[Tuple[int, int]] = []
    i, p, n = exon0, pos0, len(dic)
    while budget > 0 and 0 <= i < n:
        s1, e1, _, name = dic[i][0], dic[i][1], dic[i][2], dic[i][3]
        if name != gene_name or not (s1 <= p <= e1):
            # other gene's row, or p already walked off this exon: hop on
            i += step
            if not (0 <= i < n):
                break
            p = dic[i][1] if step < 0 else dic[i][0]
            continue
        avail = (p - s1 + 1) if step < 0 else (e1 - p + 1)
        if avail >= budget:
            out.append((p - budget, p) if step < 0 else (p - 1, p + budget - 1))
            break
        budget -= avail
        out.append((s1 - 1, p) if step < 0 else (p - 1, e1))
        i += step
        if not (0 <= i < n):
            break
        p = dic[i][1] if step < 0 else dic[i][0]
    return out


def find_positions(index: ExonIndex, chrom: str, pos: int, length: int) -> List[Tuple]:
    """Spliced ±``length`` bp exonic windows around ``pos`` (1-based)."""
    gene, exon_num = index.find_exon(chrom, pos, pos)
    if gene[0] == "":
        return []
    dic = index.dic[chrom]
    left = _half_window(dic, gene[1], exon_num, pos - 1, length, -1)
    right = _half_window(dic, gene[1], exon_num, pos, length, +1)
    return left[::-1] + [("H", "")] + right


def window_sequence(reference, index: ExonIndex, chrom: str, pos: int, length: int,
                    strand: str = "+") -> Tuple[str, str]:
    """Extract the (left, right) spliced window sequences around ``pos``.

    Replaces the BED -> ``bedtools getfasta -s`` round-trip
    (functions.py:1583, :1677): intervals come from :func:`find_positions`,
    sequence from the in-memory :class:`~anchored_fusion_tpu.io.fasta.Reference`.
    On '-' strand the two halves are reverse-complemented and swapped, matching
    make_negative_file (functions.py:1601-1603) / get_test_reads (:1703-1704).
    """
    from anchored_fusion_tpu.ops.encode import decode_to_str, revcomp
    import numpy as np

    poses = find_positions(index, chrom, pos, length)
    left_chunks, right_chunks = [], []
    side = left_chunks
    for p in poses:
        if p[0] == "H":
            side = right_chunks
            continue
        # find_positions emits 0-based half-open intervals (BED convention).
        side.append(reference.fetch(chrom, int(p[0]) + 1, int(p[1])))
    left = np.concatenate(left_chunks) if left_chunks else np.zeros(0, np.int8)
    right = np.concatenate(right_chunks) if right_chunks else np.zeros(0, np.int8)
    if strand == "-":
        left, right = revcomp(right), revcomp(left)
    return decode_to_str(left), decode_to_str(right)
