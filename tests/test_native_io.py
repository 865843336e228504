import numpy as np

from anchored_fusion_tpu.io.native import (
    get_lib, decode_fastq_native, encode_dna_native)
from anchored_fusion_tpu.io.fastq import _read_one_matrix, _read_raw
import anchored_fusion_tpu.io.native as nat


def test_native_lib_builds():
    assert get_lib() is not None, "system toolchain should build the codec"


def test_encode_dna_native_matches_python():
    from anchored_fusion_tpu.ops.encode import encode_ascii
    s = b"ACGTNacgtnXX-"
    out = encode_dna_native(s)
    np.testing.assert_array_equal(out, encode_ascii(s))


def test_decode_fastq_native_matches_python_fallback():
    path = "/root/reference/test/test_sample_1.fastq.gz"
    data = _read_raw(path)
    names_n, seq_n, lens_n = decode_fastq_native(data)
    orig = nat.decode_fastq_native
    nat.decode_fastq_native = lambda *a, **k: None
    try:
        names_p, seq_p, lens_p = _read_one_matrix(path)
    finally:
        nat.decode_fastq_native = orig
    assert names_n == names_p
    np.testing.assert_array_equal(seq_n, seq_p)
    np.testing.assert_array_equal(lens_n, lens_p)


def test_decode_fastq_native_handles_plain_and_edge():
    data = b"@r1 extra\nACGT\n+\nIIII\n@r2/2\nNNNN\n+\nIIII\n"
    names, seq, lens = decode_fastq_native(data)
    assert names == ["r1", "r2"]
    assert list(lens) == [4, 4]
    np.testing.assert_array_equal(seq[0, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(seq[1, :4], [4, 4, 4, 4])
    assert (seq[:, 4:] == 5).all()
