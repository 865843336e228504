"""Ten-stage pipeline parity run on the bundled reference sample.

The reference's canonical test is README.md:42: the bundled FASTQ pair +
BCR anchor + genome must yield a BCR--ABL1 call through all stages
(Anchored_Fusion.py:123-227).  hg38 is absent here, so the genome side runs
against a *surrogate genome* reconstructed from the wgsim read names
(bench/surrogate.py): the real ABL1 partner-side sequence recovered from the
reads at a chr9 locus, BCR at a chr22 locus, and the five decoy fusions split
into separate gene loci.

Parity anchors (CLAUDE.md): mapped == 1261; dominant MS breakpoint 3235 with
flanks ...GCAGAGTTCAAA | AGCCCTTCAG... (BCR-ABL1 b3a2).
"""

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.bench.surrogate import (
    locate_junction, parse_wgsim_name, reconstruct_transcripts,
    surrogate_from_sample)
from anchored_fusion_tpu.config import PipelineConfig
from anchored_fusion_tpu.ops.encode import BASE_N, decode_to_str
from anchored_fusion_tpu.pipeline import FusionPipeline

FASTQ1 = "/root/reference/test/test_sample_1.fastq.gz"
FASTQ2 = "/root/reference/test/test_sample_2.fastq.gz"
ANCHOR = "/root/reference/test/target_gene.fasta"


@pytest.fixture(scope="module")
def surrogate():
    return surrogate_from_sample(FASTQ1, FASTQ2, ANCHOR)


def test_wgsim_name_parse():
    assert parse_wgsim_name("EU216071.1_708_934_3:0:0_0:0:0_0/1") == \
        ("EU216071.1", 708, 934)
    assert parse_wgsim_name("not_a_wgsim_read") is None


def test_reconstruction_exact_on_clean_reads():
    """Error-free padded reads must reconstruct their source EXACTLY —
    including the reverse mates, whose revcomp'd rows carry a leading PAD
    run that the vote placement must account for."""
    from anchored_fusion_tpu.bench.simulate import simulate_pairs
    from anchored_fusion_tpu.io.fastq import ReadBatch
    from anchored_fusion_tpu.ops.encode import encode_ascii

    rng = np.random.default_rng(5)
    src = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    names, r1, r2 = simulate_pairs(rng, src, 600, error_rate=0.0)
    seq = np.stack([
        np.stack([encode_ascii(x, length=128), encode_ascii(y, length=128)])
        for x, y in zip(r1, r2)])
    wnames = []
    for i, n in enumerate(names):
        _, s0, e0, _ = n.rsplit("_", 3)
        wnames.append(f"SRC_{int(s0) + 1}_{e0}_0:0:0_0:0:0_{i:x}")
    rb = ReadBatch(wnames, seq, np.full((len(names), 2), 101, np.int32))
    cons = reconstruct_transcripts(rb)["SRC"]
    cov = np.nonzero(cons != BASE_N)[0]
    assert (cons[cov] == encode_ascii(src)[cov]).all()


def test_transcript_reconstruction_and_junction(surrogate):
    sg, reads, anchor = surrogate
    tx = reconstruct_transcripts(reads)
    assert set(tx) == {"EU216071.1", "CIC-DUX4", "DUX4-IGH", "EML4-ALK",
                       "TMPRSS2-ERG", "TPM3-NTRK1"}
    # full interior coverage for every source at these depths
    for cons in tx.values():
        cov = np.nonzero(cons != BASE_N)[0]
        assert (cons[cov[0]:cov[-1] + 1] != BASE_N).all()
    j = locate_junction(tx["EU216071.1"], anchor.seq)
    assert j is not None
    jc, ja = j
    assert ja == 3235  # b3a2 junction in anchor coordinates
    s = decode_to_str(tx["EU216071.1"])
    assert s[jc - 12:jc] == "GCAGAGTTCAAA"
    assert s[jc:jc + 10] == "AGCCCTTCAG"
    # decoys share nothing with the anchor
    for src in tx:
        if src != "EU216071.1":
            assert locate_junction(tx[src], anchor.seq) is None


def test_surrogate_genome_layout(surrogate):
    sg, reads, anchor = surrogate
    assert sg.genes["BCR"].chrom == "chr22"
    assert sg.genes["ABL1"].chrom == "chr9"
    # every decoy half is its own annotated gene, >=10kb from its partner
    # (so the negative miner's distance filter passes: functions.py:1469)
    for name in ("CIC", "DUX4", "DUX4L1", "IGH", "EML4", "ALK",
                 "TMPRSS2", "ERG", "TPM3", "NTRK1"):
        assert name in sg.genes
    # the BCR locus carries the anchor transcript verbatim
    g = sg.genes["BCR"]
    assert np.array_equal(
        sg.genome.fetch(g.chrom, g.exons[0][0], g.exons[-1][1]), anchor.seq)


def test_bundled_sample_ten_stage_pipeline(surrogate, tmp_path):
    """README.md:42 parity: all ten stages on the real bundled reads."""
    sg, reads, anchor = surrogate
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(),
                          PipelineConfig(filter_false_positive=False))
    out = str(tmp_path / "bundled")
    res = pipe.call_gene("BCR", anchor.seq, reads, out_prefix=out)

    # stage-1 parity anchor (CLAUDE.md): 1261 reads map to the BCR transcript
    assert res.counters["anchor_mapped"] == 1261
    assert res.counters["split_reads"] > 0
    assert sg.genes["BCR"].gene_id in res.homo_genes

    fusions = {r["fusion"] for r in res.rows}
    assert "BCR--ABL1" in fusions, (fusions, res.counters)
    # no decoy gene may appear in any call
    decoys = {"CIC", "DUX4", "DUX4L1", "IGH", "EML4", "ALK",
              "TMPRSS2", "ERG", "TPM3", "NTRK1"}
    for f in fusions:
        assert not decoys & set(f.replace("--", ":").split(":")), fusions

    row = max((r for r in res.rows if r["fusion"] == "BCR--ABL1"),
              key=lambda r: r["split"])
    assert row["type"] == "MS"
    assert row["anchor_breakpoint"] == 3235
    assert row["partner_chrom"] == "chr9"
    # junction = the ABL1 gene's very first base in the surrogate layout
    assert row["partner_breakpoint"] == sg.genes["ABL1"].exons[0][0]
    assert row["split"] >= 8 and row["spanning"] >= 3

    txt = open(out + "_predictions_abridged.txt").read()
    assert txt.startswith("Fusion_gene\t")
    assert "BCR--ABL1" in txt
