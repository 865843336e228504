import numpy as np

from anchored_fusion_tpu.call.breakpoints import (
    SplitRead, SplitCluster, cluster_split_reads, _flanks_consistent)
from anchored_fusion_tpu.call.consensus import (
    ConsensusPWM, merge_clusters, _similar_shifted)


def _sr(name, bp, type_, left, right):
    return SplitRead(name, "ANCHOR", bp, type_, left, right)


def test_flanks_consistent_suffix_prefix():
    assert _flanks_consistent("AACGT", "GGTT", "CGT", "GGTTAA")
    assert not _flanks_consistent("AACGT", "GGTT", "CGA", "GGTT")
    assert not _flanks_consistent("AACGT", "GGTT", "CGT", "GATT")


def test_cluster_split_reads_grouping():
    reads = [
        _sr("r1", 100, "MS", "AAAACCCC", "GGGGTTTT"),
        _sr("r2", 100, "MS", "ACCCC", "GGGGTTTTAA"),     # consistent with r1
        _sr("r3", 100, "MS", "AAAACCCC", "TTTTGGGG"),    # different right flank
        _sr("r4", 200, "SM", "AAAA", "CCCC"),
    ]
    groups = cluster_split_reads(reads)
    assert [bp for bp, _ in groups] == [100, 200]
    g100 = groups[0][1]
    assert len(g100) == 2
    assert g100[0].cnt == 2 and set(g100[0].reads) == {"r1", "r2"}
    # longest flanks kept (Split_reads.add_reads parity)
    assert g100[0].seq_left == "AAAACCCC"
    assert g100[0].seq_right == "GGGGTTTTAA"


def test_pwm_consensus_tie_is_N():
    pwm = ConsensusPWM("c", 10, "MS")
    pwm.add("AA", "TT", 1, ["a"], 0)
    pwm.add("AC", "TT", 1, ["b"], 0)
    # position -1: A vs C tie -> N; position -2: AA -> A
    assert pwm.left_consensus() == "AN"
    assert pwm.right_consensus() == "TT"


def test_merge_within_breakpoint_90pct():
    base_l, base_r = "ACGTACGTAC" * 3, "TTGGCCAATT" * 3
    noisy_l = base_l[:-1] + "G"  # 1/30 mismatch ~ 97% identity
    c1 = SplitCluster("c", 50, "MS", base_l, base_r, ["x"], cnt=3)
    c2 = SplitCluster("c", 50, "MS", noisy_l, base_r, ["y"], cnt=1)
    out = merge_clusters([(50, [c1, c2])])
    assert len(out) == 1
    assert out[0].cnt == 4
    # majority vote restores the base sequence
    assert out[0].seq_left == base_l


def test_merge_across_nearby_breakpoints():
    # same junction reported at bp 50 and 52 (2bp shift)
    l, r = "ACGTACGTACGTACGTACGT", "GGCCGGCCGGCCGGCCGGCC"
    c1 = SplitCluster("c", 50, "MS", l, r, ["a"], cnt=5)
    # cluster at 52: breakpoint 2 further right -> left flank has 2 extra bases
    c2 = SplitCluster("c", 52, "MS", l + r[:2], r[2:], ["b"], cnt=1)
    out = merge_clusters([(50, [c1]), (52, [c2])])
    assert len(out) == 1
    assert out[0].breakpoint == 50 and out[0].cnt == 6


def test_merge_keeps_distinct_junctions():
    c1 = SplitCluster("c", 50, "MS", "ACGTACGTACGTACGTACGT", "GGCCGGCCGGCCGGCCGGCC", ["a"], cnt=2)
    c2 = SplitCluster("c", 51, "MS", "TTTTTTTTTTTTTTTTTTTT", "AAAAAAAAAAAAAAAAAAAA", ["b"], cnt=2)
    out = merge_clusters([(50, [c1]), (51, [c2])])
    assert len(out) == 2


def test_similar_shifted_empty_fails():
    assert not _similar_shifted("", "AC", "AC", "AC", 0.9, 0)
    assert not _similar_shifted("AC", "AC", "AC", "", 0.9, 0)


def test_bundled_sample_junction_consensus():
    """End-to-end anchored-side slice: the BCR-ABL1 b3a2 junction must emerge
    as the dominant consensus cluster at transcript position 3235."""
    from anchored_fusion_tpu.io import read_fastq_pair, read_fasta
    from anchored_fusion_tpu.align import align_to_reference, classify_clips
    from anchored_fusion_tpu.call.breakpoints import (
        extract_split_reads, oriented_sequences)
    rb = read_fastq_pair("/root/reference/test/test_sample_1.fastq.gz",
                         "/root/reference/test/test_sample_2.fastq.gz")
    anchor = read_fasta("/root/reference/test/target_gene.fasta")
    seqs = rb.seq.reshape(-1, rb.max_len)
    lens = rb.length.reshape(-1)
    names = [nm for nm in rb.names for _ in range(2)]
    res = align_to_reference(seqs, anchor.seq)
    kind, _, _ = classify_clips(res, lens)
    osq = oriented_sequences(seqs, res.strand)
    srs = extract_split_reads(names, osq, lens, kind, res.read_start,
                              res.read_end, res.ref_start, res.ref_end, "BCR")
    merged = merge_clusters(cluster_split_reads(srs))
    top = max(merged, key=lambda c: c.cnt)
    assert top.breakpoint == 3235
    assert top.type_ == "MS"
    assert top.cnt >= 8
    assert top.seq_left.endswith("CAGAGTTCAAA")        # BCR b3 end
    assert top.seq_right.startswith("AGCCCTTCAG")      # ABL1 a2 start
    # every read in the junction cluster comes from the fusion transcript
    assert all(r.startswith("EU216071.1") for r in top.reads)
