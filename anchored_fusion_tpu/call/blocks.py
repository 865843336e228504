"""Partner-gene block clustering from spanning and split evidence.

Re-design of ``Find_blocks`` / ``Find_fine_block`` / ``Block``
(functions.py:88-119, :376-496, :506-654).  The per-read work (genome
alignment of rescued mates and clipped reads) happens on device through the
k-mer engine; this module consumes those fixed-shape hit records and maintains
the per-chromosome sorted block lists with the reference's exon-aware merge
semantics (gap <= 200 exonic bp, functions.py:448-489).

All block coordinates are 1-based inclusive genomic positions local to their
contig.  (The reference mixes SAM 1-based and PSL 0-based coordinates across
these two functions; its +-10 exon slack and +-100/200 pads absorb the 1bp
differences, and we normalize to 1-based throughout.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.annotate.exon_walk import find_positions
from anchored_fusion_tpu.config import CallConfig


@dataclasses.dataclass
class Block:
    """One candidate partner region (Block parity, functions.py:88-119)."""

    chrom: str
    start: int
    end: int
    gene: List[str]          # [gene_id, gene_name, chrom, exon_start, exon_end]
    min_exon_num: int
    max_exon_num: int
    count: int = 0
    reads: List[str] = dataclasses.field(default_factory=list)
    anchored_split_breakpoints: set = dataclasses.field(default_factory=set)
    bad: bool = False

    def add_read(self, start: int, end: int, read: str):
        self.start = min(self.start, start)
        self.end = max(self.end, end)
        self.count += 1
        self.reads.append(read)

    def absorb(self, other: "Block"):
        self.start = min(self.start, other.start)
        self.end = max(self.end, other.end)
        self.count += other.count
        self.reads.extend(other.reads)
        self.min_exon_num = min(self.min_exon_num, other.min_exon_num)
        self.max_exon_num = max(self.max_exon_num, other.max_exon_num)


BlocksByChrom = Dict[str, List[Block]]


def _exonic_gap(index: ExonIndex, chrom: str, left: Block, right: Block) -> int:
    """Exonic distance between two same-gene blocks with an exon-number gap.

    Walks the intervening exon intervals exactly as functions.py:455-463:
    counts only exons of the same gene that do not overlap their predecessor.
    """
    dic = index.dic[chrom]
    e = left.max_exon_num + 1
    length = dic[left.max_exon_num][1] - left.end
    while e < right.min_exon_num:
        if dic[e][2] == left.gene[0] and dic[e][0] > dic[e - 1][1]:
            length += dic[e][1] - dic[e][0]
        e += 1
    if e == right.min_exon_num:
        length += right.start - dic[e][0]
    return length


def _exonic_gap_rev(index: ExonIndex, chrom: str, right: Block, left: Block) -> int:
    """Backward-walk variant (functions.py:477-483)."""
    dic = index.dic[chrom]
    e = right.min_exon_num - 1
    length = right.start - dic[right.min_exon_num][0]
    while e > left.max_exon_num:
        if dic[e][2] == right.gene[0] and dic[e][1] < dic[e + 1][0]:
            length += dic[e][1] - dic[e][0]
        e -= 1
    if e == left.min_exon_num:
        length += dic[e][1] - left.end
    return length


def _merge_neighbors(blocks: List[Block], i: int, index: ExonIndex, chrom: str,
                     gap: int) -> int:
    """Merge block ``i`` with same-gene neighbors (functions.py:448-489).

    Forward sweep absorbs following blocks into ``i``; backward sweep absorbs
    preceding blocks.  Returns the (possibly shifted) index of the block.
    """
    while i < len(blocks) - 1 and blocks[i].gene[0] == blocks[i + 1].gene[0]:
        if blocks[i + 1].min_exon_num == blocks[i].max_exon_num:
            if blocks[i].end + gap > blocks[i + 1].start:
                blocks[i].absorb(blocks[i + 1])
                del blocks[i + 1]
            else:
                break
        else:
            if _exonic_gap(index, chrom, blocks[i], blocks[i + 1]) <= gap:
                blocks[i].absorb(blocks[i + 1])
                del blocks[i + 1]
            else:
                break
    while i >= 1 and blocks[i].gene[0] == blocks[i - 1].gene[0]:
        if blocks[i].min_exon_num == blocks[i - 1].max_exon_num:
            if blocks[i].start - gap < blocks[i - 1].end:
                blocks[i].absorb(blocks[i - 1])
                del blocks[i - 1]
            else:
                break
        else:
            if _exonic_gap_rev(index, chrom, blocks[i], blocks[i - 1]) <= gap:
                blocks[i].absorb(blocks[i - 1])
                del blocks[i - 1]
            else:
                break
        i -= 1
    return i


def _insert_block(blocks: List[Block], chrom: str, start: int, end: int,
                  gene: List[str], exon_num: int, read: str,
                  index: ExonIndex, gap: int, contain_pad: int,
                  strict_containment: bool):
    """Sorted insert-or-extend of one hit (functions.py:429-489 / :566-623).

    ``strict_containment`` selects Find_fine_block's stricter membership test
    (hit must sit >= 100bp inside the block end, functions.py:572) vs
    Find_blocks' +-100bp slack test (:438).
    """
    i = len(blocks) - 1
    while i >= 0 and end < blocks[i].start:
        i -= 1
    if strict_containment:
        fits = (i >= 0 and blocks[i].gene[0] == gene[0]
                and blocks[i].start - contain_pad <= start
                and blocks[i].end >= end + contain_pad
                and blocks[i].min_exon_num <= exon_num <= blocks[i].max_exon_num)
    else:
        fits = (i >= 0 and blocks[i].gene[0] == gene[0]
                and blocks[i].min_exon_num <= exon_num <= blocks[i].max_exon_num
                and start >= blocks[i].start - contain_pad
                and end <= blocks[i].end + contain_pad)
    if fits:
        blocks[i].add_read(start, end, read)
    else:
        blk = Block(chrom, start, end, gene, exon_num, exon_num)
        blk.add_read(start, end, read)
        if i != -1 and start < blocks[i].start:
            blocks.insert(i, blk)
        else:
            blocks.insert(i + 1, blk)
            i += 1
    _merge_neighbors(blocks, i, index, chrom, gap)


def find_spanning_blocks(
    pair_hits: Sequence[Tuple[str, List[Tuple[str, int, int]]]],
    index: ExonIndex,
    homo_genes: Sequence[str],
    cfg: Optional[CallConfig] = None,
) -> BlocksByChrom:
    """Partner blocks from half-mapped pairs realigned to the genome.

    Args:
      pair_hits: per read pair, (read_name, [(chrom, start1, end1), ...]) with
        one entry per genome-mapped mate (M-span already 5bp-trimmed,
        functions.py:387).
      homo_genes: gene ids homologous to the anchor (the anchor-side test,
        functions.py:416).
    Parity with Find_blocks (functions.py:376-496): requires >= 2 mapped ends,
    not a normal same-chromosome pair (< 2000bp apart), one end in a homo
    gene and the other in exactly one non-homo gene.
    """
    cfg = cfg or CallConfig()
    homo = set(homo_genes)
    blocks_chr: BlocksByChrom = {}
    for read_name, poses in pair_hits:
        if len(poses) <= 1:
            continue
        chroms = {p[0] for p in poses}
        nums = [x for p in poses for x in (p[1], p[2])]
        if len(chroms) == 1 and max(nums) - min(nums) < cfg.min_spanning_distance:
            continue
        in_homo = -1
        partner = -1
        partner_gene: List[str] = []
        partner_exon = -1
        ok = True
        for k, (chrom, s, e) in enumerate(poses):
            gene, exon_num = index.find_exon(chrom, s, e)
            if gene[0] in homo:
                in_homo = k
            elif gene[0] != "":
                if partner == -1:
                    partner, partner_gene, partner_exon = k, gene, exon_num
                elif gene[0] != partner_gene[0]:
                    ok = False
                    break
        if not ok or in_homo == -1 or partner == -1:
            continue
        chrom, start, end = poses[partner]
        blocks = blocks_chr.setdefault(chrom, [])
        _insert_block(blocks, chrom, start, end, partner_gene, partner_exon,
                      read_name, index, cfg.block_merge_gap, 100,
                      strict_containment=False)
    # expand blocks by +-200bp of exonic sequence (functions.py:490-495)
    for blocks in blocks_chr.values():
        for blk in blocks:
            poses = find_positions(index, blk.chrom, blk.start, cfg.block_expand)
            if poses:
                blk.start = int(poses[0][0]) + 1 if poses[0][0] != "H" else blk.start
            poses = find_positions(index, blk.chrom, blk.end, cfg.block_expand)
            if poses and poses[-1][0] != "H":
                blk.end = int(poses[-1][1])
    return blocks_chr


@dataclasses.dataclass
class ClippedReadInfo:
    """Per-read metadata for the fine-block pass (spanning_anchored parity)."""

    name: str
    type_: str        # 'SM' | 'MS'
    left_length: int  # first CIGAR piece length on the anchor
    right_length: int


def find_fine_blocks(
    infos: Sequence[ClippedReadInfo],
    hits,                      # MultiHits of the oriented reads vs genome
    genome,                    # io.fasta.Reference for global->local coords
    index: ExonIndex,
    homo_genes: Sequence[str],
    blocks_chr: BlocksByChrom,
    cfg: Optional[CallConfig] = None,
) -> BlocksByChrom:
    """Split-read-derived partner blocks (Find_fine_block parity).

    For each 2-op clipped anchored read, classify its genome hits:
      * a hit spanning the clip junction          -> read is NOT chimeric (bad)
      * a hit matching exactly the clipped side   -> candidate partner block
      * a hit matching the anchored side inside a homo gene -> anchor evidence
    Reads need anchor evidence and no junction-spanning hit
    (functions.py:629-649); surviving blocks merge into ``blocks_chr`` with
    the same exon-aware merge as the spanning pass.
    """
    cfg = cfg or CallConfig()
    homo = set(homo_genes)
    sl = cfg.fine_block_slack
    by_read: Dict[int, List[int]] = {}
    for h, rid in enumerate(hits.read_id):
        by_read.setdefault(int(rid), []).append(h)
    for rid, idxs in sorted(by_read.items()):
        info = infos[rid]
        bad = False
        good = False
        cand: List[Tuple[str, int, int]] = []
        for h in idxs:
            span = int(hits.ref_end[h] - hits.ref_start[h]) + 1
            if span > cfg.fine_block_max_span:
                continue
            qs = int(hits.q_start[h])            # 0-based inclusive
            qe = int(hits.q_end[h]) + 1          # exclusive (PSL in_end)
            ll, rl = info.left_length, info.right_length
            chrom, s1 = genome.to_local(int(hits.ref_start[h]))
            e1 = s1 + span - 1
            if info.type_ == "MS":
                if qs <= ll // 2 and qe >= ll + sl:
                    bad = True
                elif ll - sl <= qs <= ll + sl and qe >= ll + rl - sl:
                    cand.append((chrom, s1, e1))
                elif qs <= sl and qe <= ll + sl:
                    gene, _ = index.find_exon(chrom, s1, e1)
                    if gene[0] in homo:
                        good = True
            else:  # SM
                if ll - sl <= qe <= ll + sl and qs <= sl:
                    cand.append((chrom, s1, e1))
                elif qs < ll - sl and qe >= ll + rl // 2:
                    bad = True
                elif ll - sl <= qs <= ll + sl and qe >= ll + rl - sl:
                    gene, _ = index.find_exon(chrom, s1, e1)
                    if gene[0] in homo:
                        good = True
        if bad or not good:
            continue
        for chrom, s1, e1 in cand:
            gene, exon_num = index.find_exon(chrom, s1, e1)
            if gene[0] == "" or gene[0] in homo:
                continue
            blocks = blocks_chr.setdefault(chrom, [])
            _insert_block(blocks, chrom, s1, e1, gene, exon_num, info.name,
                          index, cfg.block_merge_gap, 100,
                          strict_containment=True)
    return blocks_chr
