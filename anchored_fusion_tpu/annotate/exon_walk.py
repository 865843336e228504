"""Exon-walk windows: spliced +-length bp windows around a genomic position.

Faithful re-implementation of the reference's ``find_positions``
(functions.py:1331-1391): starting from the exon containing ``pos``, walk
exon intervals of the same gene upstream and downstream collecting ``length``
bp of *exonic* sequence on each side.  Returns a list of 0-based half-open
(start, end) intervals with an ('H', '') sentinel separating the upstream and
downstream halves — identical structure to the reference so every consumer
(block expansion functions.py:490-495, negative mining :1553-1568, filter
inputs :1663-1674) ports over unchanged.
"""

from __future__ import annotations

from typing import List, Tuple

from anchored_fusion_tpu.annotate.exon_index import ExonIndex


def find_positions(index: ExonIndex, chrom: str, pos: int, length: int) -> List[Tuple]:
    gene, exon_num = index.find_exon(chrom, pos, pos)
    poses: List[Tuple] = []
    forward_length = length
    backward_length = length
    if gene[0] == "":
        return poses
    dic = index.dic[chrom]
    n = len(dic)

    exon_num_now = exon_num
    pos_now = pos - 1
    while forward_length > 0:
        if (
            dic[exon_num_now][3] != gene[1]
            or dic[exon_num_now][0] > pos_now
            or dic[exon_num_now][1] + 1 <= pos_now
        ):
            exon_num_now -= 1
            if exon_num_now < 0 or exon_num_now >= n:
                break
            pos_now = dic[exon_num_now][1]
            continue
        l = pos_now - dic[exon_num_now][0] + 1
        if l >= forward_length:
            poses = [(pos_now - forward_length, pos_now)] + poses
            forward_length -= l
        elif l != 0:
            forward_length -= l
            poses = [(dic[exon_num_now][0] - 1, pos_now)] + poses
            exon_num_now -= 1
            if exon_num_now < 0:
                break
            pos_now = dic[exon_num_now][1]
        else:
            exon_num_now -= 1
            if exon_num_now < 0:
                break
            pos_now = dic[exon_num_now][1]

    exon_num_now = exon_num
    pos_now = pos
    poses.append(("H", ""))
    while backward_length > 0:
        if (
            dic[exon_num_now][3] != gene[1]
            or dic[exon_num_now][0] > pos_now
            or dic[exon_num_now][1] + 1 <= pos_now
        ):
            exon_num_now += 1
            if exon_num_now < 0 or exon_num_now >= n:
                break
            pos_now = dic[exon_num_now][0]
            continue
        l = dic[exon_num_now][1] + 1 - pos_now
        if l >= backward_length:
            poses.append((pos_now - 1, pos_now + backward_length - 1))
            backward_length = 0
        elif l != 0:
            backward_length -= l
            poses.append((pos_now - 1, dic[exon_num_now][1]))
            exon_num_now += 1
            if exon_num_now >= n:
                break
            pos_now = dic[exon_num_now][0]
        else:
            exon_num_now += 1
            if exon_num_now >= n:
                break
            pos_now = dic[exon_num_now][0]
    return poses


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
