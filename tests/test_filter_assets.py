"""BASELINE config 3 from a fresh checkout (VERDICT r3 missing #1):
`cli/common.setup_filter` must run the full mine-negatives -> train -> score
path using ONLY shipped assets — the generated `data/positive_samples.txt`
(bench/make_positive_assets.py ≙ the reference's data/positive_seq.txt,
consumed by Anchored_Fusion.py:91-112) resolved through the checkout-root
fallback, with negatives mined in-framework from the sample reads."""

import os
import types

import numpy as np
import pytest

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.bench.simulate import make_synthetic_genome
from anchored_fusion_tpu.cli.common import resolve_data_path, setup_filter
from anchored_fusion_tpu.config import FilterModelConfig, PipelineConfig
from anchored_fusion_tpu.ops.encode import encode_ascii
from anchored_fusion_tpu.pipeline import FusionPipeline

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_positive_asset_exists_and_parses():
    path = resolve_data_path("./data/positive_samples.txt")
    assert os.path.exists(path), "shipped positive set missing from checkout"
    from anchored_fusion_tpu.models.data import read_junction_file
    rows = read_junction_file(path)
    assert len(rows) >= 3381
    assert all(len(r) == 201 and r[100] == "H" for r in rows[:50])


def test_resolve_data_path_falls_back_to_checkout_root(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)   # CWD without a data/ directory
    p = resolve_data_path("./data/positive_samples.txt")
    assert p == os.path.join(REPO_ROOT, "data/positive_samples.txt")
    # existing paths and missing non-shipped paths pass through untouched
    assert resolve_data_path(str(tmp_path)) == str(tmp_path)
    assert resolve_data_path("./nope.txt") == "./nope.txt"


def test_setup_filter_trains_from_shipped_assets(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)   # fresh-checkout user CWD: no local data/
    rng = np.random.default_rng(11)
    # wide intergenic gaps: setup_filter mines at the production 10kb
    # min_locus_distance, so the chimera's two loci must sit >=10kb apart
    sg = make_synthetic_genome(rng, n_genes=6, gene_prefix="W",
                               intergenic=(3000, 5000))
    index = ExonIndex(sg.gtf_dic, inject_loci=False)
    # one quick epoch: the asset path, not model quality, is under test
    cfg = PipelineConfig(filter_model=FilterModelConfig(num_epochs=1))
    pipe = FusionPipeline(sg.genome, index, sg.gene_rows(), cfg)

    # several distinct chimeric gene pairs: negatives dedup per pair, and the
    # balanced 70/30 split needs more than one row per class to train
    reads = []
    for na, nb in (("W1", "W4"), ("W2", "W5"), ("W3", "W5"), ("W4", "W2")):
        seqA = sg.genome.fetch_str("chr1", *sg.genes[na].exons[0])
        seqB = sg.genome.fetch_str("chr1", *sg.genes[nb].exons[0])
        for i in range(3):
            reads.append(encode_ascii(seqA[10 + i:60 + i] + seqB[20 + i:71 + i],
                                      length=128))
    seqA = sg.genome.fetch_str("chr1", *sg.genes["W1"].exons[0])
    reads += [encode_ascii(seqA[i:101 + i], length=128) for i in range(6)]

    args = types.SimpleNamespace(
        not_filter_false_positive=False,
        not_train_filter_model=False,
        model_file=str(tmp_path / "model.msgpack"),
        positive_samples="./data/positive_samples.txt",   # CLI default
        negative_samples="./Model/negative_samples.txt",  # CLI default
        homo_gene_file="./data/homo_gene.npy",            # CLI default
    )
    filt = setup_filter(args, pipe, index, np.stack(reads), ["W0"],
                        str(tmp_path / "Model"))
    assert filt is not None, "filter must train from shipped assets alone"
    # mined negatives were persisted for reuse
    assert os.path.exists(tmp_path / "Model" / "negative_samples.txt")
    from anchored_fusion_tpu.models.train import score_junctions
    row = "A" * 100 + "H" + "C" * 100
    scores = score_junctions(filt, [row])
    assert len(scores) == 1 and 0.0 <= float(scores[0]) <= 1.0
