import numpy as np
import pytest

from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str, revcomp
from anchored_fusion_tpu.ops.diagonal import diag_match_counts
from anchored_fusion_tpu.ops import kadane
from anchored_fusion_tpu.ops import sw
from anchored_fusion_tpu.align.aligner import align_to_reference, classify_clips
from tests.conftest import random_dna

import jax.numpy as jnp


@pytest.fixture()
def rng(request):
    """Order-independent per-test rng (overrides the session fixture).

    The session-scoped rng's stream position depends on which test FILES ran
    before this one, so random fixture data silently changed with pytest
    selection — test_align_chimeric_read_soft_clips once drew a junction
    whose first partner base equaled the next reference base, legally
    extending the alignment by 1 and failing the exact-coordinate assert.
    A per-test seed derived from the test name keeps every test's data fixed
    under ANY test selection or ordering."""
    import hashlib
    h = int.from_bytes(hashlib.blake2b(
        request.node.name.encode(), digest_size=4).digest(), "big")
    return np.random.default_rng(h)


def test_diag_match_counts_exact(rng):
    ref = random_dna(rng, 300)
    read = ref[100:150]
    R = 64
    reads = encode_ascii(read, length=R)[None]
    counts = np.array(diag_match_counts(jnp.asarray(reads), jnp.asarray(encode_ascii(ref))))
    # diagonal index j = offset + R - 1; read starts at ref offset 100
    j = 100 + R - 1
    assert counts[0, j] == 50.0
    # no other diagonal should reach 50
    counts[0, j] = 0
    assert counts.max() < 50


def test_kadane_best_segment_simple():
    # +1 match, -4 mismatch; best run is positions 3..7
    sc = np.full((1, 10), -4, np.int32)
    sc[0, 3:8] = 1
    ism = (sc > 0).astype(np.int32)
    seg = kadane.best_segment(jnp.asarray(sc), jnp.asarray(ism))
    assert int(seg["score"][0]) == 5
    assert int(seg["start"][0]) == 3
    assert int(seg["end"][0]) == 7
    assert int(seg["matches"][0]) == 5


def test_kadane_tolerates_inner_mismatch():
    # run of 10 matches, 1 mismatch, 10 matches: should bridge (10-4+10=16)
    sc = np.full((1, 30), -100, np.int32)
    sc[0, 2:12] = 1
    sc[0, 12] = -4
    sc[0, 13:23] = 1
    ism = (sc > 0).astype(np.int32)
    seg = kadane.best_segment(jnp.asarray(sc), jnp.asarray(ism))
    assert int(seg["score"][0]) == 16
    assert int(seg["start"][0]) == 2
    assert int(seg["end"][0]) == 22


def _numpy_sw(read, win, match=1, mismatch=4, go=7, ge=1):
    """Golden full affine-gap local DP (O(RW) python, small inputs only)."""
    R, W = len(read), len(win)
    H = np.zeros((R + 1, W + 1), np.int32)
    E = np.full((R + 1, W + 1), -10**6, np.int32)
    F = np.full((R + 1, W + 1), -10**6, np.int32)
    best = 0
    for i in range(1, R + 1):
        for j in range(1, W + 1):
            s = match if read[i - 1] == win[j - 1] else -mismatch
            E[i][j] = max(H[i][j - 1] - go, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go, F[i - 1][j] - ge)
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            best = max(best, H[i][j])
    return best


@pytest.mark.parametrize("trial", range(5))
def test_sw_matches_numpy_golden(rng, trial):
    R, W = 24, 32
    read = rng.integers(0, 4, R).astype(np.int8)
    win = rng.integers(0, 4, W).astype(np.int8)
    # embed a noisy copy of part of the read
    win[4:4 + 12] = read[6:18]
    if trial % 2:
        win = np.delete(win, 9)  # introduce an indel
        win = np.append(win, np.int8(0))
    golden = _numpy_sw(read, win)
    got = sw.sw_end(jnp.asarray(read[None]), jnp.asarray(win[None]),
                    jnp.ones((1, R), bool), jnp.ones((1, W), bool))
    assert int(got[0][0]) == golden


def test_sw_align_coordinates(rng):
    # read: 8 random + 16 copied from window + 8 random
    win = rng.integers(0, 4, 64).astype(np.int8)
    read = np.concatenate([
        rng.integers(0, 4, 8), win[20:36], rng.integers(0, 4, 8)]).astype(np.int8)
    res = sw.sw_align(jnp.asarray(read[None]), jnp.asarray(win[None]),
                      jnp.ones((1, 32), bool), jnp.ones((1, 64), bool))
    assert int(res["end_read"][0]) >= 22
    assert int(res["start_read"][0]) <= 9
    assert int(res["start_win"][0]) in range(18, 23)


def test_align_exact_read(rng):
    ref = random_dna(rng, 2000)
    sub = ref[500:601]
    reads = encode_ascii(sub, length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref))
    assert res.mapped[0]
    assert res.strand[0] == 0
    assert res.ref_start[0] == 500 and res.ref_end[0] == 600
    assert res.read_start[0] == 0 and res.read_end[0] == 100
    kind, lc, rc = classify_clips(res, np.array([101]))
    assert kind[0] == 1 and lc[0] == 0 and rc[0] == 0


def test_align_revcomp_read(rng):
    ref = random_dna(rng, 2000)
    sub = decode_to_str(revcomp(encode_ascii(ref[800:901])))
    reads = encode_ascii(sub, length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref))
    assert res.mapped[0] and res.strand[0] == 1
    assert res.ref_start[0] == 800 and res.ref_end[0] == 900


def test_align_chimeric_read_soft_clips(rng):
    """A fusion-like read: left 40bp from refA, right 61bp elsewhere."""
    ref = random_dna(rng, 3000)
    other = random_dna(rng, 200)
    # the partner's first base must differ from ref[1040], else the anchored
    # segment legitimately extends past the engineered junction
    if other[0] == ref[1040]:
        other = "ACGT"["ACGT".index(other[0]) - 1] + other[1:]
    read = ref[1000:1040] + other[:61]
    reads = encode_ascii(read, length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref), min_score=20)
    assert res.mapped[0]
    assert res.read_start[0] == 0 and res.read_end[0] == 39
    assert res.ref_start[0] == 1000 and res.ref_end[0] == 1039
    kind, lc, rc = classify_clips(res, np.array([101]), min_clip=1)
    assert kind[0] == 3  # MS: matched then clipped
    assert rc[0] == 61


def test_align_mismatch_tolerance(rng):
    ref = random_dna(rng, 1500)
    sub = list(ref[200:301])
    # introduce 3 scattered SNPs
    for p in (20, 50, 80):
        sub[p] = "ACGT"[("ACGT".index(sub[p]) + 1) % 4]
    reads = encode_ascii("".join(sub), length=128)[None]
    res = align_to_reference(reads, encode_ascii(ref))
    assert res.mapped[0]
    assert res.ref_start[0] == 200 and res.ref_end[0] == 300
    assert res.matches[0] == 98 and res.length[0] == 101


def test_align_batch_bundled_sample_smoke():
    """First 256 bundled reads vs the BCR transcript: BCR-derived reads map."""
    from anchored_fusion_tpu.io.fastq import read_fastq_pair
    from anchored_fusion_tpu.io.fasta import read_fasta
    rb = read_fastq_pair("/root/reference/test/test_sample_1.fastq.gz",
                         "/root/reference/test/test_sample_2.fastq.gz")
    anchor = read_fasta("/root/reference/test/target_gene.fasta")
    # Sample across the whole file — it is grouped by source transcript.
    idx = np.arange(0, rb.n_pairs, rb.n_pairs // 256)[:256]
    seqs = rb.seq[idx, 0, :]
    res = align_to_reference(seqs, anchor.seq)
    names = [rb.names[i] for i in idx]
    bcr = np.array([n.startswith("EU216071.1") for n in names])
    # EU216071.1 is the BCR-ABL1 fusion transcript: its mate-1 reads from the
    # BCR half must map; CIC-DUX4 etc. decoy reads must not.
    # ~half of the fusion transcript is the ABL1 side, so roughly half of its
    # mate-1 reads should map to BCR.
    assert res.mapped[bcr].mean() > 0.3
    assert res.mapped[~bcr].mean() < 0.05
