"""Filter-on end-to-end: mine -> train -> score -> 0.1/0.9 gate -> report.

Covers the chain the reference runs when the filter is enabled
(Anchored_Fusion.py:91-121 setup, :212-225 scoring, functions.py:1786-1791
gate), on the real bundled sample against the surrogate genome: the decoy
fusion transcripts were deliberately split into two gene loci each
(bench/surrogate.py), so their junction-straddling reads are genuine mined
negatives, and the reference's own shipped positive set
(data/positive_seq.txt) supplies the positives.
"""

import os

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.bench.surrogate import surrogate_from_sample
from anchored_fusion_tpu.bench.simulate import write_gtf, write_fasta
from anchored_fusion_tpu.config import FilterModelConfig, PipelineConfig
from anchored_fusion_tpu.models import data as fdata
from anchored_fusion_tpu.models.negative import mine_negative_junctions
from anchored_fusion_tpu.models.train import train_filter_model, score_junctions

FASTQ1 = "/root/reference/test/test_sample_1.fastq.gz"
FASTQ2 = "/root/reference/test/test_sample_2.fastq.gz"
ANCHOR = "/root/reference/test/target_gene.fasta"
POSITIVES = "/root/reference/data/positive_seq.txt"

SMALL_CFG = FilterModelConfig(
    block_dim=64, embed_dim=64, class_dim=64, transformer_dim=32,
    transformer_ff=64, batch_size=64, num_epochs=6, learning_rate=1e-3)


@pytest.fixture(scope="module")
def surrogate():
    return surrogate_from_sample(FASTQ1, FASTQ2, ANCHOR)


def test_filter_chain_on_bundled_sample(surrogate, tmp_path):
    """mine -> train -> score through call_gene with the filter ON."""
    from anchored_fusion_tpu.cli.common import make_score_fn
    from anchored_fusion_tpu.models.train import TrainedFilter
    from anchored_fusion_tpu.ops.encode import decode_to_str
    from anchored_fusion_tpu.pipeline import FusionPipeline

    sg, reads, anchor = surrogate
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(),
                          PipelineConfig(filter_false_positive=True))

    # 1. mine negatives from the whole sample (decoy midpoint chimeras).
    # The reference dedups one row per gene PAIR (functions.py:1477-1490),
    # and the bundled sample carries only 5 decoy fusions (one of them an
    # IG pair, rejected by Inspect_name) — so a handful of rows is the
    # correct yield here, not a bug.
    all_seqs = reads.seq.reshape(-1, reads.max_len)
    rows = mine_negative_junctions(pipe.genome_aligner, sg.genome, index,
                                   all_seqs, ["BCR"])
    assert len(rows) >= 2, rows
    for r in rows:
        pair = r.split("\t")[1]
        assert "BCR" not in pair and "ABL1" not in pair, pair
        junction = r.split("\t")[0]
        assert len(junction) == 201 and junction[100] == "H"

    # 2. train on reference positives + mined-plus-synthetic negatives (a
    # real run mines thousands of pairs from a whole sample; the test pads
    # the class with random-window junk junctions so the split isn't tiny)
    positives = fdata.read_junction_file(POSITIVES)
    negatives = [r.split("\t")[0] for r in rows]
    jrng = np.random.default_rng(3)
    bases = np.array(list("ACGT"))
    while len(negatives) < 300:
        s = "".join(bases[jrng.integers(0, 4, 200)])
        negatives.append(s[:100] + "H" + s[100:])
    filt = train_filter_model(positives, negatives, SMALL_CFG,
                              str(tmp_path / "model.msgpack"), verbose=False)
    assert filt.best_auc > 0.7, filt.best_auc

    # 3. pipeline with the filter on: the true fusion must survive scoring
    score_fn = make_score_fn(filt, decode_to_str(anchor.seq), sg.genome, index)
    res = pipe.call_gene("BCR", anchor.seq, reads,
                         out_prefix=str(tmp_path / "filt"),
                         score_fn=score_fn)
    fusions = {r["fusion"]: r for r in res.rows}
    assert "BCR--ABL1" in fusions, (fusions, res.counters)
    row = fusions["BCR--ABL1"]
    assert row["anchor_breakpoint"] == 3235
    assert row["score"] > 0.1
    txt = open(str(tmp_path / "filt") + "_predictions_abridged.txt").read()
    assert "Natural_score" in txt.splitlines()[0]


def test_report_gate_changes_row_set(tmp_path):
    """The 0.1/0.9 gate (functions.py:1786-1791) must drop low-score
    candidates from the full report while the abridged file keeps them."""
    from anchored_fusion_tpu.call.candidates import Candidate
    from anchored_fusion_tpu.call.report import write_final_fusion

    def cand(bp, score, n):
        c = Candidate("MS")
        c.add_reads(bp, ["chr9", 100 + bp, "+", 200, 0],
                    "ACGTACGTAC" * 3, "TTGGCCAATT" * 3, "GATTACA" * 3, n,
                    [f"s{bp}_{i}" for i in range(n)],
                    [f"b{bp}_{i}" for i in range(n)])
        c.score = score
        return c

    good, junk = cand(1000, 0.95, 10), cand(2000, 0.05, 10)
    rows = write_final_fusion(str(tmp_path / "gate"), [good, junk], "BCR",
                              ExonIndex({}, inject_loci=False),
                              [0.95, 0.05], 20, True)
    bps = {r["anchor_breakpoint"] for r in rows}
    assert 1000 in bps and 2000 not in bps
    # abridged lists both candidates; the gate only guards the full report
    abridged = open(str(tmp_path / "gate") + "_predictions_abridged.txt").read()
    assert abridged.count("\n") >= 3

    # filter off: both emitted
    rows_off = write_final_fusion(str(tmp_path / "gate2"), [good, junk], "BCR",
                                  ExonIndex({}, inject_loci=False),
                                  [], 20, False)
    assert {r["anchor_breakpoint"] for r in rows_off} == {1000, 2000}


@pytest.mark.slow
def test_bulk_cli_end_to_end(surrogate, tmp_path, monkeypatch, capsys):
    """Bulk CLI parity drive (README.md:42): bundled sample + surrogate
    genome + filter ON -> mined negatives persisted, model trained + saved,
    BCR--ABL1 emitted with a Natural_score column."""
    from anchored_fusion_tpu.cli import bulk

    sg, reads, anchor = surrogate
    genome_fa = str(tmp_path / "genome.fa")
    gtf = str(tmp_path / "ann.gtf")
    seqs = {c: sg.genome.fetch_str(c, 1, int(sg.genome.lengths[i]))
            for i, c in enumerate(sg.genome.names)}
    write_fasta(seqs, genome_fa)
    write_gtf(sg, gtf)
    out = str(tmp_path / "out")

    # the reference trains its full-size model for 30 epochs; shrink it for
    # the test (architecture identical, widths reduced)
    def small_cfg(**kw):
        return PipelineConfig(filter_model=SMALL_CFG, **kw)

    monkeypatch.setattr(bulk, "PipelineConfig", small_cfg)
    rc = bulk.main([
        "--file_anchored_cds", ANCHOR,
        "--fastq1", FASTQ1, "--fastq2", FASTQ2,
        "--file_ref_seq", genome_fa, "--file_ref_ann", gtf,
        "--out_folder", out,
        "--positive_samples", POSITIVES,
        "--model_file", str(tmp_path / "model.msgpack"),
        "--negative_samples", str(tmp_path / "nonexistent_negatives.txt"),
    ])
    assert rc == 0
    mined = os.path.join(out, "model_dir", "negative_samples.txt")
    assert os.path.exists(mined) and open(mined).read().strip()
    pred = os.path.join(out, "BCR_fusion", "BCR_fusion_predictions_abridged.txt")
    txt = open(pred).read()
    assert txt.splitlines()[0].startswith("Fusion_gene")
    assert "Natural_score" in txt.splitlines()[0]
    assert "BCR--ABL1" in txt
    assert os.path.exists(os.path.join(out, "run_stats.json"))
