import numpy as np

from anchored_fusion_tpu.align.aligner import align_to_reference, classify_clips
from anchored_fusion_tpu.align.refine import (
    path_matches, refine_alignments, select_for_refinement)
from anchored_fusion_tpu.config import AlignConfig
from anchored_fusion_tpu.ops.encode import encode_ascii
from tests.conftest import random_dna

UNGAPPED = AlignConfig(gapped_refine=False)


def test_refine_bridges_deletion(rng):
    ref = random_dna(rng, 3000)
    # read with a 3bp deletion relative to the reference at ref pos 1000..1100
    read = ref[1000:1050] + ref[1053:1104]   # 101bp read, deletion of 3
    reads = encode_ascii(read, length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref), UNGAPPED, min_score=20)
    assert res.mapped[0]
    # ungapped: best segment covers only one side of the deletion
    ungapped_span = res.ref_end[0] - res.ref_start[0] + 1
    assert ungapped_span <= 60
    refined = refine_alignments(res, reads, np.array([101]), encode_ascii(ref))
    # gapped alignment bridges the deletion and spans (almost) the whole locus
    span = refined.ref_end[0] - refined.ref_start[0] + 1
    assert span >= 95, (refined.ref_start[0], refined.ref_end[0])
    assert refined.ref_start[0] == 1000
    assert refined.score[0] > res.score[0]
    # exact matches of the gapped path: 101 read bases minus nothing (the
    # deletion skips reference bases, every read base still matches)
    assert refined.matches[0] == 101
    # the production default config applies the same refinement inline
    auto = align_to_reference(reads, encode_ascii(ref), min_score=20)
    assert auto.ref_start[0] == refined.ref_start[0]
    assert auto.score[0] == refined.score[0]
    assert auto.matches[0] == 101


def test_refine_leaves_clean_alignments_alone(rng):
    ref = random_dna(rng, 2000)
    reads = encode_ascii(ref[500:601], length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref), UNGAPPED)
    sel = select_for_refinement(res, np.array([101]))
    assert len(sel) == 0
    refined = refine_alignments(res, reads, np.array([101]), encode_ascii(ref))
    np.testing.assert_array_equal(refined.ref_start, res.ref_start)
    np.testing.assert_array_equal(refined.score, res.score)


def test_path_matches_counts_substitutions(rng):
    ref = random_dna(rng, 500)
    read = list(ref[100:201])
    read[50] = "ACGT"[("ACGT".index(read[50]) + 1) % 4]  # one SNP
    reads = encode_ascii("".join(read), length=128)[None]
    wins = encode_ascii(ref[80:240], length=160)[None]
    m = path_matches(reads, wins)
    assert m[0] == 100  # 101 bases, one mismatch


def test_indel_junction_read_recovers_breakpoint():
    """VERDICT #3 done-criterion: a fusion junction read carrying a 2bp indel
    near the junction must still produce the correct anchored breakpoint once
    the gapped post-pass runs (bwa bridges such reads; the ungapped engine
    alone either drops them or mis-clips)."""
    from anchored_fusion_tpu.call.breakpoints import (
        cluster_split_reads, extract_split_reads, oriented_sequences)

    # dedicated rng: the shared session fixture's state depends on which
    # tests ran before, and this test's assertions are sequence-content
    # sensitive (a chance repeat around the junction can shift a breakpoint
    # by 1 exactly as bwa would)
    rng = np.random.default_rng(20260819)
    anchor = random_dna(rng, 3000)
    bp = 1500  # fusion after anchor position 1500 (1-based breakpoint)
    # partner's first bases must differ from the anchor continuation, else a
    # coincidental match lets the (correct) local alignment extend one base
    # past the junction — bwa shifts such breakpoints the same way
    partner = "".join(
        "ACGT"[("ACGT".index(anchor[bp + k]) + 1) % 4] for k in range(2)
    ) + random_dna(rng, 2000)
    reads, names = [], []
    for i in range(12):
        left = anchor[bp - 60:bp]
        cut = 15 + i  # 2bp deletion at varying offsets near the junction
        left = left[:cut] + left[cut + 2:]
        read = left + partner[:101 - len(left)]
        reads.append(encode_ascii(read, length=128))
        names.append(f"ind{i}")
    seqs = np.stack(reads)
    lens = np.full(len(reads), 101, np.int32)

    res_off = align_to_reference(seqs, encode_ascii(anchor), UNGAPPED)
    res_on = align_to_reference(seqs, encode_ascii(anchor))
    kinds_on, _, _ = classify_clips(res_on, lens)
    osq = oriented_sequences(seqs, res_on.strand)
    srs = extract_split_reads(names, osq, lens, kinds_on, res_on.read_start,
                              res_on.read_end, res_on.ref_start,
                              res_on.ref_end, "T")
    bps = {s.breakpoint for s in srs}
    assert bps == {bp}, bps
    assert len(srs) == 12  # every indel read recovered as an MS split read
    groups = cluster_split_reads(srs)
    assert groups[0][0] == bp

    # without the gapped pass these reads cannot all reach the breakpoint
    kinds_off, _, _ = classify_clips(res_off, lens)
    srs_off = extract_split_reads(names, oriented_sequences(seqs, res_off.strand),
                                  lens, kinds_off, res_off.read_start,
                                  res_off.read_end, res_off.ref_start,
                                  res_off.ref_end, "T")
    assert {s.breakpoint for s in srs_off} != {bp}


def test_sw_align_fast_under_pinned_cpu_device(rng):
    """The fused Pallas kernel must not be selected when computation is
    pinned to CPU devices (the virtual-mesh dryrun): Pallas only interprets
    on the CPU backend, so `_sw_align_fast` must take the lax fallback
    whenever `jax.default_device` names a non-TPU platform."""
    import jax
    from anchored_fusion_tpu.align.refine import _sw_align_fast
    from anchored_fusion_tpu.ops.encode import PAD
    reads = np.full((8, 32), PAD, np.int8)
    wins = np.full((8, 64), PAD, np.int8)
    reads[:, :20] = encode_ascii(random_dna(rng, 20))
    wins[:, 5:25] = reads[:, :20]
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        out = _sw_align_fast(reads, wins, reads != PAD, wins != PAD,
                             AlignConfig())
    assert (np.asarray(out["score"]) >= 20).all()
    assert (np.asarray(out["end_win"]) == 24).all()
    assert (np.asarray(out["start_win"]) == 5).all()
