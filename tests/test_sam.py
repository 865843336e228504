from anchored_fusion_tpu.io.sam import (
    parse_cigar, normalize_cigar, cigar_from_segment, write_sam, read_sam)


def test_parse_cigar():
    assert parse_cigar("55S46M") == [(55, "S"), (46, "M")]
    assert parse_cigar("*") == []


def test_normalize_plain_sm():
    ops, seq = normalize_cigar("55S46M", "A" * 101)
    assert ops == [[55, 55, "S"], [101, 46, "M"]]
    assert len(seq) == 101


def test_normalize_deletion_pads_and_merges():
    # 10M 2D 10M over a 20-base read: D merges into the next M, seq padded
    ops, seq = normalize_cigar("10M2D10M", "ACGTACGTAC" + "TTTTTTTTTT")
    assert ops == [[22, 22, "M"]]
    assert seq == "ACGTACGTAC" + "NN" + "TTTTTTTTTT"


def test_normalize_insertion_cut():
    ops, seq = normalize_cigar("10M3I10M", "ACGTACGTAC" + "GGG" + "TTTTTTTTTT")
    assert ops == [[20, 20, "M"]]
    assert seq == "ACGTACGTAC" + "TTTTTTTTTT"


def test_normalize_intron_and_hard_clip():
    ops, _ = normalize_cigar("5H10M100N10M5S", "A" * 25)
    assert ops == [[20, 20, "M"], [25, 5, "S"]]


def test_normalize_eq_x_fold():
    ops, _ = normalize_cigar("5=1X4=", "A" * 10)
    assert ops == [[10, 10, "M"]]


def test_cigar_from_segment():
    assert cigar_from_segment(101, 0, 100) == "101M"
    assert cigar_from_segment(101, 55, 100) == "55S46M"
    assert cigar_from_segment(101, 0, 60) == "61M40S"


def test_sam_roundtrip(tmp_path):
    p = str(tmp_path / "x.sam")
    write_sam(p, "BCR", 6783, [("r1", 0, 100, 60, "101M", "A" * 101)])
    recs = list(read_sam(p))
    assert recs == [("r1", 0, "BCR", 100, "101M", "A" * 101)]
