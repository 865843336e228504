"""Full-pipeline test on a hermetic synthetic genome.

hg38 is not available in this environment, so the genome-side stages (mate
rescue, homolog masking, blocks, candidate validation, reporting) are
exercised against a generated genome+GTF with a known engineered fusion —
the pipeline must recover exactly that fusion and name the partner gene.
"""

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.bench.simulate import (
    make_synthetic_genome, fuse_transcripts, simulate_pairs, coverage_to_pairs)
from anchored_fusion_tpu.config import PipelineConfig
from anchored_fusion_tpu.io.fastq import ReadBatch
from anchored_fusion_tpu.ops.encode import encode_ascii
from anchored_fusion_tpu.pipeline import FusionPipeline


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(11)
    sg = make_synthetic_genome(rng, n_genes=6, exons_per_gene=(3, 5),
                               exon_len=(250, 400))
    # pick a '+'-strand anchor and partner so transcript coords map simply
    plus = [g for g in sg.genes.values() if g.strand == "+"]
    anchor, partner = plus[0], plus[1]
    decoy = [g for g in sg.genes.values()
             if g.name not in (anchor.name, partner.name)][0]
    return rng, sg, anchor, partner, decoy


def _make_reads(rng, sg, anchor, partner, decoy, fusion_cov=40, wt_cov=20):
    tx_a = anchor.transcript(sg.genome)
    tx_p = partner.transcript(sg.genome)
    tx_d = decoy.transcript(sg.genome)
    # junction mid-exon: 5' anchor up to mid of exon 2, 3' partner from inside
    # exon 1 with plenty of exon left
    break5 = sum(e - s + 1 for s, e in anchor.exons[:2]) - 100
    break3 = 60
    fusion = fuse_transcripts(tx_a, tx_p, break5, break3)
    names, r1, r2 = [], [], []
    for tx, cov, pre in ((fusion, fusion_cov, "FUS"), (tx_a, wt_cov, "WTA"),
                         (tx_p, wt_cov, "WTP"), (tx_d, wt_cov, "WTD")):
        nm, a, b = simulate_pairs(rng, tx, coverage_to_pairs(len(tx), cov),
                                  name_prefix=pre)
        names += nm
        r1 += a
        r2 += b
    seq = np.stack([
        np.stack([encode_ascii(x, length=128), encode_ascii(y, length=128)])
        for x, y in zip(r1, r2)])
    length = np.full((len(names), 2), 101, np.int32)
    return ReadBatch(names, seq, length), fusion, break5


def test_full_pipeline_recovers_engineered_fusion(synth, tmp_path):
    rng, sg, anchor, partner, decoy = synth
    reads, fusion_tx, break5 = _make_reads(rng, sg, anchor, partner, decoy)
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(),
                          PipelineConfig(filter_false_positive=False))
    anchor_codes = encode_ascii(anchor.transcript(sg.genome))
    out = str(tmp_path / "synt")
    result = pipe.call_gene(anchor.name, anchor_codes, reads, out_prefix=out)

    assert result.counters["anchor_mapped"] > 0
    assert result.counters["split_reads"] > 0
    # the anchor gene must be in its own homolog mask
    assert anchor.gene_id in result.homo_genes

    fusions = {r["fusion"] for r in result.rows}
    expected = f"{anchor.name}--{partner.name}"
    assert expected in fusions, (fusions, result.counters)
    # no decoy fusion call
    assert all(decoy.name not in f for f in fusions)
    # a 1-read error cluster may produce a second row at a shifted breakpoint
    # (the reference joins it the same way); judge the dominant row
    row = max((r for r in result.rows if r["fusion"] == expected),
              key=lambda r: r["split"])
    assert row["anchor_breakpoint"] == break5
    assert row["split"] >= 3 and row["spanning"] >= 1

    # output files exist with headers
    txt = open(out + "_predictions_abridged.txt").read()
    assert txt.startswith("Fusion_gene\t")
    assert expected in txt


def test_pipeline_mesh_matches_single_device(synth, tmp_path):
    """The mesh IS the pipeline's spine: the same call_gene on a dp x mp
    device mesh (anchored alignment dp-sharded, genome k-mer index mp-sharded,
    SURVEY §2.3 items 1-2) must produce the identical GeneCallResult as the
    single-device identity path."""
    import jax
    from anchored_fusion_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    rng, sg, anchor, partner, decoy = synth
    reads, fusion_tx, break5 = _make_reads(rng, sg, anchor, partner, decoy)
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    anchor_codes = encode_ascii(anchor.transcript(sg.genome))

    single = FusionPipeline(sg.genome, index, sg.gene_rows(),
                            PipelineConfig(filter_false_positive=False))
    r1 = single.call_gene(anchor.name, anchor_codes, reads,
                          out_prefix=str(tmp_path / "single"))

    mesh = make_mesh((4, 2), devices=devs[:8])
    sharded = FusionPipeline(sg.genome, index, sg.gene_rows(),
                             PipelineConfig(filter_false_positive=False),
                             mesh=mesh)
    assert sharded.mesh is mesh
    assert type(sharded.genome_aligner).__name__ == "ShardedGenomeAligner"
    r2 = sharded.call_gene(anchor.name, anchor_codes, reads,
                           out_prefix=str(tmp_path / "mesh"))

    assert r2.rows == r1.rows
    assert r2.homo_genes == r1.homo_genes
    for k in r1.counters:
        if k == "wall_s" or k.startswith("time."):
            continue  # wall-clock counters differ by definition
        assert r2.counters[k] == r1.counters[k], (k, r1.counters, r2.counters)
    assert [(c.breakpoint, c.type_, c.cnt) for c in r2.clusters] == \
           [(c.breakpoint, c.type_, c.cnt) for c in r1.clusters]


def test_pipeline_no_fusion_on_wildtype_reads(synth, tmp_path):
    rng, sg, anchor, partner, decoy = synth
    tx_a = anchor.transcript(sg.genome)
    nm, r1, r2 = simulate_pairs(rng, tx_a, 200, name_prefix="WT")
    seq = np.stack([
        np.stack([encode_ascii(x, length=128), encode_ascii(y, length=128)])
        for x, y in zip(r1, r2)])
    reads = ReadBatch(nm, seq, np.full((len(nm), 2), 101, np.int32))
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(),
                          PipelineConfig(filter_false_positive=False))
    result = pipe.call_gene(anchor.name, encode_ascii(tx_a), reads,
                            out_prefix=str(tmp_path / "wt"))
    assert result.rows == []


def test_call_gene_cells_matches_serial(synth, tmp_path):
    """Cells as ONE alignment batch (SURVEY §7.2 step 7): per-cell results of
    call_gene_cells must equal serial per-cell call_gene runs."""
    rng, sg, anchor, partner, decoy = synth
    tx_a = anchor.transcript(sg.genome)
    from anchored_fusion_tpu.bench.simulate import fuse_transcripts, simulate_pairs
    break5 = sum(e - s + 1 for s, e in anchor.exons[:2]) - 100
    fusion = fuse_transcripts(tx_a, partner.transcript(sg.genome), break5, 60)

    def mk(n, seed):
        r = np.random.default_rng(seed)
        names, r1, r2 = simulate_pairs(r, fusion, n, name_prefix=f"C{seed}")
        seq = np.stack([
            np.stack([encode_ascii(x, length=128), encode_ascii(y, length=128)])
            for x, y in zip(r1, r2)])
        return ReadBatch(names, seq, np.full((len(names), 2), 101, np.int32))

    cells = {"cellA": mk(60, 1), "cellB": mk(60, 2), "cellC": mk(40, 3)}
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(),
                          PipelineConfig(filter_false_positive=False))
    anchor_codes = encode_ascii(tx_a)
    batched = pipe.call_gene_cells(
        anchor.name, anchor_codes, cells,
        out_prefix_for=lambda c: str(tmp_path / f"b_{c}"))
    homo = None
    for cell, rb in cells.items():
        serial = pipe.call_gene(anchor.name, anchor_codes, rb,
                                out_prefix=str(tmp_path / f"s_{cell}"),
                                homo_genes=homo)
        homo = serial.homo_genes
        assert batched[cell].rows == serial.rows, cell
        assert batched[cell].homo_genes == serial.homo_genes
    # failure isolation: an unalignable-junk cell records, others survive
    bad = ReadBatch(["x"], np.full((1, 2, 128), 4, np.int8),
                    np.full((1, 2), 101, np.int32))
    fails = []
    res = pipe.call_gene_cells(anchor.name, anchor_codes,
                               {"good": cells["cellA"], "bad": bad},
                               out_prefix_for=None, failures=fails)
    assert "good" in res
