"""Unit tests for the calling-layer pieces not covered by the e2e tests."""

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.annotate.exon_walk import find_positions, window_sequence
from anchored_fusion_tpu.annotate.homolog import tile_sequence, find_homolog_genes
from anchored_fusion_tpu.bench.simulate import make_synthetic_genome
from anchored_fusion_tpu.call.blocks import (
    Block, find_spanning_blocks, _insert_block)
from anchored_fusion_tpu.call.rescue import rescue_filter
from anchored_fusion_tpu.align.aligner import MultiHits
from anchored_fusion_tpu.align.genome import GenomeAligner
from anchored_fusion_tpu.config import CallConfig
from anchored_fusion_tpu.ops.encode import encode_ascii


@pytest.fixture(scope="module")
def sg():
    return make_synthetic_genome(np.random.default_rng(5), n_genes=5)


@pytest.fixture(scope="module")
def index(sg):
    return ExonIndex(sg.gtf_dic, inject_loci=False)


def test_exon_index_query(sg, index):
    g = sg.genes["GENE2"]
    s, e = g.exons[0]
    info, num = index.find_exon("chr1", s + 5, s + 20)
    assert info[1] == "GENE2"
    # intron point -> miss
    if len(g.exons) > 1:
        intron_pos = g.exons[0][1] + 50
        info, num = index.find_exon("chr1", intron_pos, intron_pos + 1)
        assert info[0] == "" or info[1] != ""  # merged genes may overlap


def test_find_positions_splices_across_introns(sg, index):
    g = sg.genes["GENE2"]
    # position near the end of exon 1: the downstream window must jump the intron
    pos = g.exons[0][1] - 10
    poses = find_positions(index, "chr1", pos, 100)
    assert ("H", "") in [tuple(p) for p in poses]
    right = [p for p in poses[[tuple(x) for x in poses].index(("H", "")) + 1:]]
    total = sum(p[1] - p[0] for p in right)
    assert total == 100
    if len(g.exons) > 1:
        assert len(right) >= 2  # split across the intron


def test_window_sequence_strand(sg, index):
    g = sg.genes["GENE2"]
    pos = g.exons[0][0] + 50
    lp, rp = window_sequence(sg.genome, index, "chr1", pos, 30, "+")
    lm, rm = window_sequence(sg.genome, index, "chr1", pos, 30, "-")
    from anchored_fusion_tpu.ops.encode import revcomp, decode_to_str
    assert lm == decode_to_str(revcomp(encode_ascii(rp)))
    assert rm == decode_to_str(revcomp(encode_ascii(lp)))


def test_tile_sequence_covers_tail():
    codes = encode_ascii("ACGT" * 100)  # 400bp
    tiles = tile_sequence(codes, width=128, stride=64)
    assert tiles.shape[1] == 128
    # last tile must reach the end of the sequence
    assert len(tiles) >= 5


def test_homolog_mask_finds_anchor_gene(sg, index):
    ga = GenomeAligner(sg.genome)
    g = sg.genes["GENE1"]
    tx = g.transcript(sg.genome)
    homo = find_homolog_genes(ga, encode_ascii(tx), sg.gene_rows(), sg.genome)
    assert g.gene_id in homo
    # unrelated random sequence hits nothing
    rng = np.random.default_rng(99)
    rand = encode_ascii("".join("ACGT"[i] for i in rng.integers(0, 4, 2000)))
    assert find_homolog_genes(ga, rand, sg.gene_rows(), sg.genome) == []


def test_find_spanning_blocks_rules(sg, index):
    g_anchor = sg.genes["GENE1"]
    g_part = sg.genes["GENE3"]
    homo = [g_anchor.gene_id]
    a_pos = g_anchor.exons[0][0] + 20
    p_pos = g_part.exons[0][0] + 20
    pairs = [
        # one end in the anchor gene, other in a single partner gene -> block
        ("r1", [("chr1", a_pos, a_pos + 80), ("chr1", p_pos, p_pos + 80)]),
        # both ends in the anchor -> no partner
        ("r2", [("chr1", a_pos, a_pos + 80), ("chr1", a_pos + 5, a_pos + 85)]),
        # single mapped end -> skipped
        ("r3", [("chr1", p_pos, p_pos + 80)]),
    ]
    blocks = find_spanning_blocks(pairs, index, homo)
    assert "chr1" in blocks and len(blocks["chr1"]) == 1
    blk = blocks["chr1"][0]
    assert blk.gene[1] == "GENE3"
    assert blk.reads == ["r1"]
    # block expanded by up to 200 exonic bp on each side
    assert blk.start <= p_pos and blk.end >= p_pos + 80


def test_spanning_blocks_reject_normal_pairs(sg, index):
    g_anchor = sg.genes["GENE1"]
    homo = [g_anchor.gene_id]
    a = g_anchor.exons[0][0] + 10
    pairs = [("r1", [("chr1", a, a + 80), ("chr1", a + 300, a + 380)])]
    # same chromosome < 2000 apart: a normal pair, not spanning evidence
    assert find_spanning_blocks(pairs, index, homo) == {}


def _hits(rows):
    a = lambda k, dt: np.asarray([r[k] for r in rows], dt)
    return MultiHits(
        read_id=a("rid", np.int32), strand=a("strand", np.int8),
        score=a("score", np.int32), matches=a("score", np.int32),
        length=(a("qe", np.int32) - a("qs", np.int32) + 1),
        q_start=a("qs", np.int32), q_end=a("qe", np.int32),
        ref_start=a("rs", np.int64), ref_end=a("re", np.int64))


def test_rescue_filter_full_length_and_straddle():
    # read 0: full-length genome hit -> dropped
    # read 1: MS junction-straddling hit -> dropped
    # read 2: clean split -> kept
    rows = [
        dict(rid=0, strand=0, score=101, qs=0, qe=100, rs=1000, re=1100),
        dict(rid=1, strand=0, score=60, qs=30, qe=95, rs=5000, re=5065),
        dict(rid=2, strand=0, score=40, qs=61, qe=100, rs=9000, re=9039),
    ]
    hits = _hits(rows)
    # all three reads are MS with anchor M covering [0, 60]
    keep = rescue_filter(3, [0, 0, 0], [61, 61, 61], [101, 101, 101], hits)
    assert list(keep) == [False, False, True]


def test_find_positions_matches_reference(sg, index):
    """Golden parity: our re-derived exon walk vs the reference's own
    find_positions (functions.py:1331-1391), run in-process over the same
    exon table, swept across positions and window lengths."""
    import importlib.util
    import sys
    import types
    if "Bio" not in sys.modules:
        # biopython is absent here; the reference only builds a
        # PairwiseAligner it never calls (functions.py:772-776), so a
        # namespace stub suffices to import the module.
        bio = types.ModuleType("Bio")
        align = types.ModuleType("Bio.Align")
        align.PairwiseAligner = lambda *a, **k: types.SimpleNamespace()
        bio.Align = align
        sys.modules["Bio"] = bio
        sys.modules["Bio.Align"] = align
    spec = importlib.util.spec_from_file_location(
        "ref_functions", "/root/reference/functions.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    gc = ref.Gene_co()
    gc.dic = {c: [list(row) for row in rows] for c, rows in index.dic.items()}

    positions = []
    for g in sg.genes.values():
        for s, e in g.exons:
            positions += [s, s + 1, (s + e) // 2, e - 1, e, e + 5]  # edges + intron
    for pos in positions:
        for length in (1, 13, 100, 250, 10_000):
            ours = [tuple(p) for p in find_positions(index, "chr1", pos, length)]
            theirs = [tuple(p) for p in ref.find_positions(gc, "chr1", pos, length)]
            assert ours == theirs, (pos, length, ours, theirs)
