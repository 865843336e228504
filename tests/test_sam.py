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


def _mh_from_lines(tmp_path, lines):
    from anchored_fusion_tpu.io.fasta import reference_from_dict
    from anchored_fusion_tpu.io.sam import multihits_from_sam
    genome = reference_from_dict({"chr1": "ACGT" * 250})
    p = tmp_path / "t.sam"
    p.write_text("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n"
                 + "\n".join(lines) + "\n")
    return multihits_from_sam(str(p), genome)


def test_multihits_hard_clip_full_read_frame(tmp_path):
    """bwa encodes SA-tagged supplementary splits with HARD clips: the
    coordinates must come back in the full-read frame (ADVICE r4) so
    mine_negative_junctions_sam's MS/SM pattern test sees the same junction
    sides as the soft-clipped primary."""
    # 100bp read, forward: primary 60M40S @ pos 1, supplementary 60H40M @ 201
    soft = ["r1\t0\tchr1\t1\t60\t60M40S\t*\t0\t0\t" + "A" * 100 + "\t*",
            "r1\t2048\tchr1\t201\t60\t60S40M\t*\t0\t0\t" + "A" * 100 + "\t*"]
    hard = ["r1\t0\tchr1\t1\t60\t60M40S\t*\t0\t0\t" + "A" * 100 + "\t*",
            "r1\t2048\tchr1\t201\t60\t60H40M\t*\t0\t0\t" + "A" * 40 + "\t*"]
    names_s, lens_s, mh_s = _mh_from_lines(tmp_path, soft)
    names_h, lens_h, mh_h = _mh_from_lines(tmp_path, hard)
    assert list(lens_h) == list(lens_s) == [100]
    for f in ("q_start", "q_end", "ref_start", "ref_end", "length"):
        assert list(getattr(mh_h, f)) == list(getattr(mh_s, f)), f


def test_multihits_hard_clip_reverse(tmp_path):
    # reverse supplementary with leading hard clip: q coords flip through the
    # FULL read length (trailing H on the original-orientation side)
    soft = ["r1\t16\tchr1\t11\t60\t30S70M\t*\t0\t0\t" + "A" * 100 + "\t*"]
    hard = ["r1\t2064\tchr1\t11\t60\t30H70M\t*\t0\t0\t" + "A" * 70 + "\t*"]
    _, lens_s, mh_s = _mh_from_lines(tmp_path, soft)
    _, lens_h, mh_h = _mh_from_lines(tmp_path, hard)
    assert list(lens_h) == list(lens_s) == [100]
    for f in ("q_start", "q_end", "ref_start", "ref_end"):
        assert list(getattr(mh_h, f)) == list(getattr(mh_s, f)), f


def test_multihits_intron_ref_end(tmp_path):
    """N (intron skip) consumes reference: a spliced STAR-style alignment's
    ref_end must include the intron span (ADVICE r4 low)."""
    lines = ["r1\t0\tchr1\t1\t60\t30M200N70M\t*\t0\t0\t" + "A" * 100 + "\t*"]
    _, _, mh = _mh_from_lines(tmp_path, lines)
    # normalized: one 100M run; ref span = 100 M bases + 200 intron bases
    assert list(mh.ref_start) == [0]
    assert list(mh.ref_end) == [0 + 100 + 200 - 1]
