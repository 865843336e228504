"""Candidate regions, anchored-split validation, candidate assembly.

TPU-era re-design of the reference's C13 stages (SURVEY §2):

  * ``build_candidate_regions``  ≙ Build_candidate_fasta (functions.py:955-991)
  * ``find_anchored_split``      ≙ Find_Anchored_split  (functions.py:994-1145)
  * ``find_candidate_genes``     ≙ Find_candidate_genes (functions.py:1148-1329)

All re-alignment passes run on device: candidate regions form one small
concatenated reference aligned with the *dense* all-diagonal engine (exact
BLAT-equivalent sensitivity at minScore 12), the junction-linearity check
uses the genome k-mer engine.  The small, order-dependent greedy joins run on
host over device-computed consensus/hit arrays, preserving reference
semantics (SURVEY §7.3 item 1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.call.blocks import Block, BlocksByChrom
from anchored_fusion_tpu.call.breakpoints import SplitCluster
from anchored_fusion_tpu.config import (
    AlignConfig, CallConfig, ANCHORED_SPLIT_PRESET, CANDIDATE_LEAK_PRESET,
    JUNCTION_LINEARITY_PRESET)
from anchored_fusion_tpu.io.fasta import Reference
from anchored_fusion_tpu.ops.encode import PAD, encode_ascii
from anchored_fusion_tpu.align.aligner import align_to_reference_multi
from anchored_fusion_tpu.annotate.homolog import tile_sequence


@dataclasses.dataclass
class CandidateRegions:
    """Concatenated candidate-region reference with region bookkeeping."""

    seq: np.ndarray                       # concatenated int8 codes
    starts: np.ndarray                    # (R,) global concat offset per region
    region_chrom: List[str]
    region_start1: List[int]              # 1-based genomic start of each region
    region_block: List[Block]

    def locate(self, concat_pos: int) -> int:
        """Region index containing a concatenated-space position."""
        return int(np.searchsorted(self.starts, concat_pos, side="right")) - 1


def build_candidate_regions(
    blocks_chr: BlocksByChrom,
    genome: Reference,
    anchor_codes: np.ndarray,
    cfg: Optional[CallConfig] = None,
) -> CandidateRegions:
    """Pad blocks +-100bp, extract region sequences, delete regions the anchor
    transcript itself aligns into (homology leak, functions.py:966-979)."""
    cfg = cfg or CallConfig()

    def _extract():
        chunks, starts, chroms, s1s, blks = [], [], [], [], []
        off = 0
        for chrom in sorted(blocks_chr):
            for blk in blocks_chr[chrom]:
                seq = genome.fetch(chrom, blk.start, blk.end)
                if len(seq) == 0:
                    continue
                chunks.append(seq)
                starts.append(off)
                chroms.append(chrom)
                s1s.append(max(1, blk.start))
                blks.append(blk)
                off += len(seq)
        seqcat = (np.concatenate(chunks) if chunks else np.zeros(0, np.int8))
        return CandidateRegions(seqcat, np.asarray(starts, np.int64),
                                chroms, s1s, blks)

    for blocks in blocks_chr.values():
        for blk in blocks:
            blk.start -= cfg.candidate_pad
            blk.end += cfg.candidate_pad
    regions = _extract()
    if regions.seq.shape[0] == 0:
        return regions
    # Anchor-leak pass: tile the anchored transcript and align against the
    # candidate reference at full sensitivity (blat -stepSize=3 -minScore=20
    # -minIdentity=0, functions.py:966).
    tiles = tile_sequence(np.asarray(anchor_codes))
    hits = align_to_reference_multi(
        tiles, regions.seq, min_score=CANDIDATE_LEAK_PRESET.min_score,
        min_identity=CANDIDATE_LEAK_PRESET.min_identity, min_seg_len=20,
        stride=CANDIDATE_LEAK_PRESET.step)
    for h in range(len(hits.score)):
        r = regions.locate(int(hits.ref_start[h]))
        if r >= 0:
            regions.region_block[r].bad = True
    for chrom in list(blocks_chr):
        blocks_chr[chrom] = [b for b in blocks_chr[chrom] if not b.bad]
    return _extract()


def _pad_queries(seqs: List[str], width: int) -> np.ndarray:
    out = np.full((max(len(seqs), 1), width), PAD, dtype=np.int8)
    for i, s in enumerate(seqs):
        enc = encode_ascii(s, length=width)
        out[i] = enc
    return out


def find_anchored_split(
    regions: CandidateRegions,
    clusters: List[SplitCluster],
    index: ExonIndex,
    anchor_codes: np.ndarray,
    cfg: Optional[CallConfig] = None,
) -> Set[int]:
    """Validate each breakpoint's partner-side consensus against the candidate
    regions, splice-extend exon-boundary hits, then verify the anchor-side
    consensus against the anchored transcript (Find_Anchored_split parity).

    Mutates ``clusters`` (other_breakpoints, splice-shifted flanks) and the
    region blocks (anchored_split_breakpoints); returns the good-id set.
    """
    cfg = cfg or CallConfig()
    sl = cfg.end_touch_slack
    good: Set[int] = set()
    if regions.seq.shape[0] == 0 or not clusters:
        return good
    width = 256

    queries = [c.seq_left if c.type_ == "SM" else c.seq_right for c in clusters]
    hits = align_to_reference_multi(
        _pad_queries(queries, width), regions.seq,
        min_score=ANCHORED_SPLIT_PRESET.min_score,
        min_identity=ANCHORED_SPLIT_PRESET.min_identity, min_seg_len=12,
        stride=ANCHORED_SPLIT_PRESET.step)

    def _region_coords(h, hitset):
        r = regions.locate(int(hitset.ref_start[h]))
        if r < 0 or regions.locate(int(hitset.ref_end[h])) != r:
            return None
        local_s = int(hitset.ref_start[h] - regions.starts[r])
        local_e = int(hitset.ref_end[h] - regions.starts[r])
        chrom = regions.region_chrom[r]
        start_y = regions.region_start1[r] + local_s
        end_y = regions.region_start1[r] + local_e
        strand = "+" if hitset.strand[h] == 0 else "-"
        return r, chrom, start_y, end_y, strand

    extensions: List[Tuple[int, int, str]] = []  # (cluster_id, add_length, seq)
    for h in range(len(hits.score)):
        ci = int(hits.read_id[h])
        cl = clusters[ci]
        l = len(queries[ci])
        s = int(hits.q_start[h])
        e = int(hits.q_end[h]) + 1            # exclusive (PSL qEnd)
        if s > sl and e < l - sl:
            continue                          # must touch a consensus end
        loc = _region_coords(h, hits)
        if loc is None:
            continue
        r, chrom, start_y, end_y, strand = loc
        ext = None
        if cl.type_ == "SM":
            if strand == "+":
                exon, _ = index.find_exon(chrom, end_y, end_y)
                if exon[0] == "":
                    continue
                if exon[4] - cfg.splice_edge_window < end_y < exon[4] and e == l:
                    add = exon[4] - end_y
                    ext = (ci, add, cl.seq_left + cl.seq_right[:add])
                else:
                    cl.add_other_breakpoint(chrom, end_y, strand, s, l - e)
            else:
                exon, _ = index.find_exon(chrom, start_y, start_y)
                if exon[0] == "":
                    continue
                if exon[3] < start_y < exon[3] + cfg.splice_edge_window and e == l:
                    add = start_y - exon[3]
                    ext = (ci, add, cl.seq_left + cl.seq_right[:add])
                else:
                    cl.add_other_breakpoint(chrom, start_y, strand, s, l - e)
        else:  # MS
            if strand == "+":
                exon, _ = index.find_exon(chrom, start_y, start_y)
                if exon[0] == "":
                    continue
                if exon[3] < start_y < exon[3] + cfg.splice_edge_window and s == 0:
                    add = start_y - exon[3]
                    ext = (ci, add, cl.seq_left[exon[3] - start_y:] + cl.seq_right)
                else:
                    cl.add_other_breakpoint(chrom, start_y, strand, s, l - e)
            else:
                exon, _ = index.find_exon(chrom, end_y, end_y)
                if exon[0] == "":
                    continue
                if exon[4] - cfg.splice_edge_window < end_y < exon[4] and s == 0:
                    add = exon[4] - 1 - end_y
                    ext = (ci, add, cl.seq_left[end_y - exon[4]:] + cl.seq_right)
                else:
                    cl.add_other_breakpoint(chrom, end_y, strand, s, l - e)
        if ext is not None:
            extensions.append(ext)
            continue
        regions.region_block[r].anchored_split_breakpoints.add(ci)
        good.add(ci)

    # Second pass: splice-extended consensus re-alignment with breakpoint
    # shift correction (functions.py:1070-1111).
    if extensions:
        ext_seqs = [e[2] for e in extensions]
        hits2 = align_to_reference_multi(
            _pad_queries(ext_seqs, width), regions.seq,
            min_score=ANCHORED_SPLIT_PRESET.min_score,
            min_identity=ANCHORED_SPLIT_PRESET.min_identity, min_seg_len=12,
            stride=ANCHORED_SPLIT_PRESET.step)
        for h in range(len(hits2.score)):
            xi = int(hits2.read_id[h])
            ci, add, _seq = extensions[xi]
            cl = clusters[ci]
            l = len(ext_seqs[xi])
            s = int(hits2.q_start[h])
            e = int(hits2.q_end[h]) + 1
            loc = _region_coords(h, hits2)
            if loc is None:
                continue
            r, chrom, start_y, end_y, strand = loc
            if cl.type_ == "SM":
                if e > l - add:
                    shift = e + add - l
                    cl.breakpoint += shift
                    cl.seq_left = cl.seq_left + cl.seq_right[:shift]
                    cl.seq_right = cl.seq_right[shift:]
                pos_y = end_y if strand == "+" else start_y
                cl.add_other_breakpoint(chrom, pos_y, strand, s, l - e)
            else:
                if s < add:
                    shift = add - s
                    cl.breakpoint -= shift
                    cl.seq_right = cl.seq_left[-shift:] + cl.seq_right
                    cl.seq_left = cl.seq_left[:-shift]
                pos_y = start_y if strand == "+" else end_y
                cl.add_other_breakpoint(chrom, pos_y, strand, s, l - e)
            regions.region_block[r].anchored_split_breakpoints.add(ci)
            good.add(ci)

    # Anchor-side verification: the anchored half of each surviving consensus
    # must align to the anchored transcript over >=90% of its length
    # (functions.py:1112-1132).
    ids = sorted(good)
    anchor_side = [clusters[i].seq_right if clusters[i].type_ == "SM"
                   else clusters[i].seq_left for i in ids]
    good2: Set[int] = set()
    if ids:
        hits3 = align_to_reference_multi(
            _pad_queries(anchor_side, width), np.asarray(anchor_codes),
            min_score=ANCHORED_SPLIT_PRESET.min_score,
            min_identity=ANCHORED_SPLIT_PRESET.min_identity, min_seg_len=12,
            stride=ANCHORED_SPLIT_PRESET.step)
        for h in range(len(hits3.score)):
            qi = int(hits3.read_id[h])
            if int(hits3.matches[h]) >= cfg.anchor_consensus_identity * len(anchor_side[qi]):
                good2.add(ids[qi])
    return good2


_CODE = {"A": 0, "T": 1, "G": 2, "C": 3}
_DECODE = "ATGC"


class Candidate:
    """One assembled fusion candidate (Candidate_reads parity,
    functions.py:230-333): left/right/mid vote matrices plus the observed
    (target_bp, partner locus) position list with counts."""

    def __init__(self, type_: str):
        self.type_ = type_
        self.pos: List[list] = []   # [tbp, chrom, obp, strand, in_bp, cut, cnt]
        self.spanning_reads: List[str] = []
        self.split_reads: List[str] = []
        self.l_left = 0
        self.l_right = 0
        self.l_mid = 0
        self.seq_left = np.zeros((200, 4), np.int32)
        self.seq_right = np.zeros((200, 4), np.int32)
        self.seq_mid = np.zeros((100, 4), np.int32)
        self.score = 0.0

    @staticmethod
    def _vote(mat: np.ndarray, seq: str, cnt: int, right_aligned: bool = False):
        codes = np.array([_CODE.get(c, -1) for c in seq], dtype=np.int32)
        sel = codes >= 0
        pos = np.nonzero(sel)[0]
        if right_aligned:
            pos_idx = mat.shape[0] - len(seq) + pos
        else:
            pos_idx = pos
        np.add.at(mat, (pos_idx, codes[sel]), cnt)

    def add_reads(self, target_bp: int, other_bp: list, seq_left: str,
                  seq_right: str, seq_mid: str, cnt: int,
                  spanning: List[str], split: List[str]):
        if seq_left:
            self._vote(self.seq_left, seq_left[-200:], cnt, right_aligned=True)
        if seq_right:
            self._vote(self.seq_right, seq_right[:200], cnt)
        if seq_mid:
            self._vote(self.seq_mid, seq_mid[:100], cnt)
        self.l_left = max(self.l_left, len(seq_left))
        self.l_right = max(self.l_right, len(seq_right))
        self.l_mid = max(self.l_mid, len(seq_mid))
        for p in self.pos:
            if (p[0] == target_bp and p[1] == other_bp[0] and p[2] == other_bp[1]
                    and p[3] == other_bp[2] and p[4] == other_bp[3]):
                p[6] += cnt
                break
        else:
            self.pos.append([target_bp] + list(other_bp) + [cnt])
        self.spanning_reads.extend(spanning)
        self.split_reads.extend(split)

    def _consensus(self, mat: np.ndarray, lo: int, hi: int) -> str:
        if hi <= lo:
            return ""
        block = mat[lo:hi]
        mx = block.max(axis=1, keepdims=True)
        ties = (block == mx).sum(axis=1)
        arg = block.argmax(axis=1)
        return "".join("N" if t > 1 else _DECODE[a] for t, a in zip(ties, arg))

    def left_consensus(self) -> str:
        return self._consensus(self.seq_left, 200 - self.l_left, 200)

    def right_consensus(self) -> str:
        return self._consensus(self.seq_right, 0, self.l_right)

    def mid_consensus(self) -> str:
        return self._consensus(self.seq_mid, 0, self.l_mid)

    def find_max_pos(self):
        """Highest-count position record + flank consensus (functions.py:321-333)."""
        max_id = 0
        max_cnt = 0
        for i, p in enumerate(self.pos):
            if p[6] > max_cnt:
                max_cnt, max_id = p[6], i
        rec = list(self.pos[max_id]) + [
            self.left_consensus(), self.right_consensus(), self.type_,
            self.mid_consensus()]
        return rec, max_id


def _similar_with_mid(l1, r1, l2, r2, m1, m2, thr) -> bool:
    """Candidate flank+mid similarity (functions.py:1155-1180)."""
    if not l1 or not l2 or not r1 or not r2:
        return False
    if m1 and m2:
        n = min(len(m1), len(m2))
        same = sum(1 for a, b in zip(m1[:n], m2[:n]) if a == b)
        if same / n < thr:
            return False
    elif (len(m1) > 3 and not m2) or (len(m2) > 3 and not m1):
        return False
    a, b = l1[::-1], l2[::-1]
    n = min(len(a), len(b))
    same = sum(1 for x, y in zip(a[:n], b[:n]) if x == y)
    if same / n <= thr:
        return False
    n = min(len(r1), len(r2))
    same = sum(1 for x, y in zip(r1[:n], r2[:n]) if x == y)
    return same / n > thr


def find_candidate_genes(
    regions: CandidateRegions,
    good_ids: Set[int],
    clusters: List[SplitCluster],
    genome_aligner,
    cfg: Optional[CallConfig] = None,
) -> Tuple[List[Candidate], int]:
    """Join blocks x validated breakpoints into candidates, then require the
    junction consensus to be genome-explainable as two flanks but NOT as one
    contiguous alignment (Find_candidate_genes parity)."""
    cfg = cfg or CallConfig()

    # Keep only each cluster's shortest-gap partner hits (functions.py:1181-1192).
    for cl in clusters:
        if not cl.other_breakpoints:
            continue
        shortest = min(ob[-1] + ob[-2] for ob in cl.other_breakpoints)
        cl.other_breakpoints = [
            ob for ob in cl.other_breakpoints if ob[-1] + ob[-2] == shortest]

    candidates: List[Candidate] = []
    for blk in regions.region_block:
        for ci in sorted(blk.anchored_split_breakpoints):
            cl = clusters[ci]
            if not cl.other_breakpoints or ci not in good_ids:
                continue
            for ob in cl.other_breakpoints:
                if ob[0] != blk.chrom:
                    continue
                seq_left = cl.seq_left
                seq_right = cl.seq_right
                seq_mid = ""
                if cl.type_ == "SM":
                    seq_left = seq_left[ob[-2]:]
                    if ob[-1] != 0:
                        seq_mid = seq_left[-ob[-1]:]
                        seq_left = seq_left[:-ob[-1]]
                else:
                    seq_mid = seq_right[:ob[-2]]
                    seq_right = seq_right[ob[-2]:]
                    if ob[-1] != 0:
                        seq_right = seq_right[:-ob[-1]]
                placed = False
                for j in range(len(candidates) - 1,
                               max(-1, len(candidates) - 1 - cfg.candidate_dedup_window), -1):
                    cand = candidates[j]
                    if cand.type_ == cl.type_ and _similar_with_mid(
                        cand.left_consensus(), cand.right_consensus(),
                        seq_left, seq_right, cand.mid_consensus(), seq_mid,
                        cfg.merge_identity,
                    ):
                        cand.add_reads(cl.breakpoint, ob, seq_left, seq_right,
                                       seq_mid, cl.cnt, blk.reads, cl.reads)
                        placed = True
                        break
                if not placed:
                    cand = Candidate(cl.type_)
                    cand.add_reads(cl.breakpoint, ob, seq_left, seq_right,
                                   seq_mid, cl.cnt, blk.reads, cl.reads)
                    candidates.append(cand)

    # Junction-linearity validation against the genome (functions.py:1243-1291):
    # need hits covering the left AND the right flank, and no single hit
    # spanning the junction.
    good_cand: List[int] = []
    if candidates:
        juncs = [c.left_consensus() + c.mid_consensus() + c.right_consensus()
                 for c in candidates]
        width = max(128, -(-max(len(j) for j in juncs) // 128) * 128)
        hits = genome_aligner.align_multi(
            _pad_queries(juncs, width),
            # preset.step applies to the dense small-reference seeder; the
            # genome engine's seeding stride is its k-mer sampling stride
            # (AlignConfig.genome_kmer // 2), fixed at index build.
            min_score=JUNCTION_LINEARITY_PRESET.min_score,
            min_identity=JUNCTION_LINEARITY_PRESET.min_identity, min_seg_len=20)
        by_cand: Dict[int, List[int]] = {}
        for h in range(len(hits.read_id)):
            by_cand.setdefault(int(hits.read_id[h]), []).append(h)
        for i, cand in enumerate(candidates):
            hs = by_cand.get(i, [])
            if not hs:
                continue
            ll, ml, rl = cand.l_left, cand.l_mid, cand.l_right
            bad = False
            flags = 0
            for h in hs:
                start = int(hits.q_start[h])
                end = int(hits.q_end[h]) + 1
                if start < ll * 0.5 and end > ll * 1.5 + ml:
                    bad = True
                elif start <= ll * 0.5 and ll * 0.5 <= end <= ll * 1.5:
                    flags |= 1
                elif (ll + ml - rl * 0.5 <= start <= ll + ml + rl * 0.5
                      and end >= ll + ml + rl * 0.5):
                    flags |= 2
            if not bad and flags == 3:
                good_cand.append(i)

    cnt_max = 0
    kept: List[Candidate] = []
    for i in good_cand:
        pos, _ = candidates[i].find_max_pos()
        kept.append(candidates[i])
        if pos[6] > cnt_max:
            cnt_max = pos[6]

    # Spanning-read rebalance between nearby candidates with skewed
    # split/spanning ratios (functions.py:1313-1324).
    for cand in kept:
        if (len(cand.spanning_reads) * cfg.rebalance_ratio < len(cand.split_reads)
                or len(cand.split_reads) * cfg.rebalance_ratio < len(cand.spanning_reads)):
            pos, _ = cand.find_max_pos()
            tbp, chrom, obp = pos[0], pos[1], pos[2]
            for other in kept:
                if other is cand:
                    continue
                pos2, _ = other.find_max_pos()
                if (abs(pos2[0] - tbp) < 100 and chrom == pos2[1]
                        and (obp - pos2[2]) < 100):
                    denom = len(cand.split_reads) + len(other.split_reads)
                    if denom == 0:
                        continue
                    ratio = len(cand.split_reads) / denom
                    spanning = sorted(set(cand.spanning_reads + other.spanning_reads))
                    cut = int(ratio * len(spanning))
                    cand.spanning_reads = spanning[:cut]
                    other.spanning_reads = spanning[cut:]
    return kept, cnt_max
