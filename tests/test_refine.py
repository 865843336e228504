import numpy as np

from anchored_fusion_tpu.align.aligner import align_to_reference
from anchored_fusion_tpu.align.refine import refine_alignments, select_for_refinement
from anchored_fusion_tpu.ops.encode import encode_ascii
from tests.conftest import random_dna


def test_refine_bridges_deletion(rng):
    ref = random_dna(rng, 3000)
    # read with a 3bp deletion relative to the reference at ref pos 1000..1100
    read = ref[1000:1050] + ref[1053:1104]   # 101bp read, deletion of 3
    reads = encode_ascii(read, length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref), min_score=20)
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


def test_refine_leaves_clean_alignments_alone(rng):
    ref = random_dna(rng, 2000)
    reads = encode_ascii(ref[500:601], length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref))
    sel = select_for_refinement(res, np.array([101]))
    assert len(sel) == 0
    refined = refine_alignments(res, reads, np.array([101]), encode_ascii(ref))
    np.testing.assert_array_equal(refined.ref_start, res.ref_start)
    np.testing.assert_array_equal(refined.score, res.score)
