"""Negative mining, positive building, and filter-input rows on synthetic data."""

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.align.genome import GenomeAligner
from anchored_fusion_tpu.bench.simulate import make_synthetic_genome
from anchored_fusion_tpu.models.negative import mine_negative_junctions, _inspect_name
from anchored_fusion_tpu.models.positive import build_positive_junctions
from anchored_fusion_tpu.ops.encode import encode_ascii


@pytest.fixture(scope="module")
def world():
    # distinct gene-name prefixes so the 3-letter-sibling filter doesn't
    # reject every synthetic pair
    rng = np.random.default_rng(21)
    sg = make_synthetic_genome(rng, n_genes=6, gene_prefix="Q")
    for i, (name, g) in enumerate(list(sg.genes.items())):
        pass
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    ga = GenomeAligner(sg.genome)
    return rng, sg, index, ga


def test_inspect_name_rules():
    assert _inspect_name("IGH", "ABL1")
    assert _inspect_name("ENSG0001", "ABL1")
    assert _inspect_name("BCRX", "BCRY")      # 3-letter prefix siblings
    assert not _inspect_name("BCR", "ABL1")


def _rename_genes(sg, index):
    """Give genes non-sibling names (Q0..Q5 share the 'Q' 1-char prefix only;
    names shorter than 3 chars pass Inspect_name)."""
    return sg


def test_mine_negatives_from_chimeric_reads(world):
    rng, sg, index, ga = world
    gA = sg.genes["Q1"]
    gB = sg.genes["Q4"]
    # exonic chimeric artifact reads: 50bp from gene A exon + 51bp from gene B exon
    a_s, a_e = gA.exons[0]
    b_s, b_e = gB.exons[0]
    seqA = sg.genome.fetch_str("chr1", a_s, a_e)
    seqB = sg.genome.fetch_str("chr1", b_s, b_e)
    reads = []
    for i in range(6):
        reads.append(encode_ascii(seqA[10 + i:60 + i] + seqB[20 + i:71 + i],
                                  length=128))
    # plus some ordinary linear reads that must NOT mine
    for i in range(6):
        reads.append(encode_ascii(seqA[i:101 + i], length=128))
    rows = mine_negative_junctions(ga, sg.genome, index, np.stack(reads),
                                   gene_names=["Q0"], min_locus_distance=1000)
    assert rows, "expected at least one mined negative junction"
    seq, name = rows[0].split("\t")
    assert len(seq) == 201 and seq[100] == "H"
    assert name == "Q1->Q4"
    # dedup: the same pair mines only once
    assert len(rows) == 1


def test_mine_negatives_excludes_target_gene(world):
    rng, sg, index, ga = world
    gA, gB = sg.genes["Q1"], sg.genes["Q4"]
    seqA = sg.genome.fetch_str("chr1", *gA.exons[0])
    seqB = sg.genome.fetch_str("chr1", *gB.exons[0])
    reads = [encode_ascii(seqA[10:60] + seqB[20:71], length=128)]
    rows = mine_negative_junctions(ga, sg.genome, index, np.stack(reads),
                                   gene_names=["Q1"], min_locus_distance=1000)
    assert rows == []


def test_mine_negatives_from_sam_matches_in_framework(world, tmp_path):
    """SAM-ingestion parity (VERDICT r3 #6): mining from an external SAM of
    the same alignments yields the same junction rows as the in-framework
    path (functions.py:1425-1441 consumes a pre-existing whole-genome BAM)."""
    from anchored_fusion_tpu.models.negative import mine_negative_junctions_sam
    from anchored_fusion_tpu.ops.encode import decode_to_str, revcomp

    rng, sg, index, ga = world
    gA, gB = sg.genes["Q1"], sg.genes["Q4"]
    seqA = sg.genome.fetch_str("chr1", *gA.exons[0])
    seqB = sg.genome.fetch_str("chr1", *gB.exons[0])
    reads = []
    for i in range(4):
        reads.append(encode_ascii(seqA[10 + i:60 + i] + seqB[20 + i:71 + i],
                                  length=128))
    for i in range(4):
        reads.append(encode_ascii(seqA[i:101 + i], length=128))
    seqs = np.stack(reads)
    rows_native = mine_negative_junctions(ga, sg.genome, index, seqs,
                                          gene_names=["Q0"],
                                          min_locus_distance=1000)
    assert rows_native, "fixture must mine at least one junction"

    # externalize the very same alignments as a SAM file (what a user's
    # bwa-mem BAM would contain: primary + secondary split hits, NM/AS tags)
    hits = ga.align_multi(seqs, min_score=20, min_seg_len=20, top_k=6)
    order = np.lexsort((-np.asarray(hits.score), np.asarray(hits.read_id)))
    lines = ["@HD\tVN:1.6\tSO:unsorted"]
    for c, ln in zip(sg.genome.names, sg.genome.lengths):
        lines.append(f"@SQ\tSN:{c}\tLN:{int(ln)}")
    seen = set()
    for h in order:
        rid = int(hits.read_id[h])
        L = int((seqs[rid] != 5).sum())
        qs, qe = int(hits.q_start[h]), int(hits.q_end[h])
        rev = int(hits.strand[h]) == 1
        flag = 0x10 if rev else 0
        if rid in seen:
            flag |= 0x100
        seen.add(rid)
        lc, rc = (L - 1 - qe, qs) if rev else (qs, L - 1 - qe)
        cigar = (f"{lc}S" if lc else "") + \
            f"{qe - qs + 1}M" + (f"{rc}S" if rc else "")
        codes = seqs[rid][:L]
        seq = decode_to_str(revcomp(codes) if rev else codes)
        chrom, pos1 = sg.genome.to_local(int(hits.ref_start[h]))
        nm = int(hits.length[h]) - int(hits.matches[h])
        lines.append(f"r{rid}\t{flag}\t{chrom}\t{pos1}\t60\t{cigar}\t*\t0\t0"
                     f"\t{seq}\t*\tNM:i:{nm}\tAS:i:{int(hits.score[h])}")
    sam = tmp_path / "external.sam"
    sam.write_text("\n".join(lines) + "\n")

    rows_sam = mine_negative_junctions_sam(str(sam), sg.genome, index,
                                           gene_names=["Q0"],
                                           min_locus_distance=1000)
    assert rows_sam == rows_native


def test_build_positive_junctions(world):
    rng, sg, index, ga = world
    g1, g2 = sg.genes["Q2"], sg.genes["Q3"]
    p1 = g1.exons[0][0] + 120
    p2 = g2.exons[0][0] + 50
    rows = build_positive_junctions(
        [("Q2->Q3", ("chr1", p1, "+"), ("chr1", p2, "+"))], sg.genome, index)
    assert len(rows) == 1
    seq, name = rows[0].split("\t")
    assert name == "Q2->Q3"
    assert len(seq) == 201 and seq[100] == "H"
    # left side = 100bp of exonic sequence ending at p1-1 (when deep enough
    # into the gene), right side starts at p2
    left = seq[:100].lstrip("N")
    assert left and "H" not in left


def test_filter_input_rows_roundtrip(world):
    """build_test_rows emits 201-char H-rows for pipeline candidates."""
    rng, sg, index, ga = world
    from anchored_fusion_tpu.call.candidates import Candidate
    from anchored_fusion_tpu.models.test_reads import build_test_rows, attach_scores
    g = sg.genes["Q3"]
    obp = g.exons[0][0] + 80
    anchor_seq = sg.genes["Q1"].transcript(sg.genome)
    cand = Candidate("MS")
    cand.add_reads(300, ["chr1", obp, "+", 0, 0], "A" * 40, "C" * 40, "",
                   3, ["s1"], ["b1"])
    rows, row_cand = build_test_rows([cand], anchor_seq, sg.genome, index)
    assert len(rows) == 1 and row_cand == [0]
    assert len(rows[0]) == 201 and rows[0][100] == "H"
    # anchor-left side must match the transcript around breakpoint 300
    assert rows[0][:100].endswith(anchor_seq[199:299])
    scores = attach_scores([cand], row_cand, [0.7])
    assert scores == [0.7]
