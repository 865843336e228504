"""End-to-end single-cell CLI test on a tiny synthetic cohort."""

import os

import numpy as np
import pytest

from anchored_fusion_tpu.bench.simulate import (
    make_synthetic_genome, fuse_transcripts, simulate_pairs, write_fastq_pair,
    write_gtf, write_fasta)


@pytest.mark.slow
def test_singlecell_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(11)
    sg = make_synthetic_genome(rng, n_genes=6, exons_per_gene=(3, 5),
                               exon_len=(250, 400))
    plus = [g for g in sg.genes.values() if g.strand == "+"]
    anchor, partner = plus[0], plus[1]
    tx_a, tx_p = anchor.transcript(sg.genome), partner.transcript(sg.genome)
    break5 = sum(e - s + 1 for s, e in anchor.exons[:2]) - 100
    fusion = fuse_transcripts(tx_a, tx_p, break5, 60)

    cells = str(tmp_path / "cells")
    os.makedirs(cells)
    # cell A carries the fusion, cell B is wild-type
    nm, r1, r2 = simulate_pairs(rng, fusion, 220, name_prefix="F")
    write_fastq_pair(f"{cells}/cellA_1.fastq.gz", f"{cells}/cellA_2.fastq.gz",
                     nm, r1, r2)
    nm, r1, r2 = simulate_pairs(rng, tx_a, 150, name_prefix="W")
    write_fastq_pair(f"{cells}/cellB_1.fastq.gz", f"{cells}/cellB_2.fastq.gz",
                     nm, r1, r2)

    write_gtf(sg, str(tmp_path / "ann.gtf"))
    write_fasta({sg.genome.names[0]: sg.genome.fetch_str(
        "chr1", 1, sg.genome.total_length)}, str(tmp_path / "genome.fa"))
    write_fasta({f"NM_000001.1 {anchor.name}": tx_a}, str(tmp_path / "anchor.fasta"))
    (tmp_path / "names.txt").write_text(anchor.name + "\n")

    from anchored_fusion_tpu.cli.sc import main
    rc = main([
        "--file_anchored_cds", str(tmp_path / "anchor.fasta"),
        "--gene_names", str(tmp_path / "names.txt"),
        "--fastq_dir", cells,
        "--file_ref_seq", str(tmp_path / "genome.fa"),
        "--file_ref_ann", str(tmp_path / "ann.gtf"),
        "--out_folder", str(tmp_path / "out"),
        "--not_filter_false_positive",
    ])
    assert rc == 0
    agg = (tmp_path / "out" / anchor.name /
           f"{anchor.name}_fusion_gene_cell_predictions_abridged.txt").read_text()
    lines = agg.strip().splitlines()
    assert lines[0].startswith("Fusion_gene")
    fusion_rows = [l for l in lines[1:]
                   if l.startswith(f"{anchor.name}--{partner.name}")]
    assert fusion_rows, agg
    # the fusion is present in exactly one cell
    best = max(fusion_rows, key=lambda l: int(l.split("\t")[6]))
    cols = best.split("\t")
    assert cols[7] == "1" and cols[8] == "cellA"


def test_discover_pairs_suffix_parity(tmp_path):
    from anchored_fusion_tpu.cli.sc import discover_pairs
    d = str(tmp_path)
    for f in ["a_1.fastq", "a_2.fastq", "b_1.fq.gz", "b_2.fq.gz",
              "c_1.fastq.gz", "lonely_1.fastq", "d_2.fastq"]:
        open(os.path.join(d, f), "w").close()
    pairs = discover_pairs(d)
    names = sorted(p[0] for p in pairs)
    assert names == ["a", "b"]


def test_align_config_auto_operating_point():
    """CLI auto genome knobs: hg38-scale genomes get the measured operating
    point (stride 8 / k=14 / two-pass); small genomes keep parity defaults;
    explicit flags win."""
    import argparse
    from anchored_fusion_tpu.cli.common import align_config_for
    ns = argparse.Namespace(index_stride=0, genome_kmer=0, xl_two_pass=-1)
    small = align_config_for(ns, 300_000)
    assert (small.index_stride, small.genome_kmer, small.xl_two_pass) \
        == (1, 13, False)
    big = align_config_for(ns, 3_100_000_000)
    assert (big.index_stride, big.genome_kmer, big.xl_two_pass) == (8, 14, True)
    ns2 = argparse.Namespace(index_stride=4, genome_kmer=13, xl_two_pass=0)
    forced = align_config_for(ns2, 3_100_000_000)
    assert (forced.index_stride, forced.genome_kmer, forced.xl_two_pass) \
        == (4, 13, False)


def test_align_config_xl_profiles():
    """--xl_profile maps to the measured two-pass operating points
    (docs/HG38_BENCH.json round5): robust (default, also the profile when the
    namespace lacks the flag), balanced, throughput."""
    import argparse
    from anchored_fusion_tpu.cli.common import align_config_for
    expected = {"robust": (4, 4, 16, 8),
                "balanced": (4, 2, 16, 8),
                "throughput": (2, 2, 8, 8)}
    for name, (p1h, p1k, rh, rk) in expected.items():
        ns = argparse.Namespace(index_stride=0, genome_kmer=0, xl_two_pass=-1,
                                xl_profile=name)
        cfg = align_config_for(ns, 3_100_000_000)
        assert (cfg.xl_pass1_hits, cfg.xl_pass1_top_k,
                cfg.xl_rescue_hits, cfg.xl_rescue_top_k) == (p1h, p1k, rh, rk)
    # namespaces without the flag (library callers) fall back to robust
    bare = argparse.Namespace(index_stride=0, genome_kmer=0, xl_two_pass=-1)
    cfg = align_config_for(bare, 3_100_000_000)
    assert (cfg.xl_pass1_hits, cfg.xl_pass1_top_k) == (4, 4)
