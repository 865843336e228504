"""GenomeAlignerXL (merged stride-scaled index + tiled extension) vs the
flat GenomeAligner: same best hits on a multi-tile genome, including reads
straddling tile boundaries, plus the multi-hit path and the index merge."""

import dataclasses

import numpy as np
import pytest

from anchored_fusion_tpu.align.genome import GenomeAligner
from anchored_fusion_tpu.align.genome_xl import (
    GenomeAlignerXL, build_index_xl, build_tiles_host)
from anchored_fusion_tpu.config import AlignConfig
from anchored_fusion_tpu.io.fasta import reference_from_dict
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str, revcomp
from tests.conftest import random_dna

TILE = 65536  # small tiles -> the 300KB genome spans 5 tile rows


@pytest.fixture(scope="module")
def world(rng):
    seq = random_dna(rng, 300_000)
    ref = reference_from_dict({"c": seq})
    reads, truth = [], []
    for i in range(48):
        start = int(rng.integers(0, 299_000))
        sub = seq[start:start + 101]
        if i % 3 == 0:
            sub = decode_to_str(revcomp(encode_ascii(sub)))
        reads.append(encode_ascii(sub, length=128))
        truth.append(start)
    # reads straddling tile boundaries (rows at multiples of TILE)
    for b in (TILE, 3 * TILE):
        reads.append(encode_ascii(seq[b - 50:b + 51], length=128))
        truth.append(b - 50)
    return ref, np.stack(reads), truth


@pytest.mark.parametrize("stride", [2, 4])
def test_xl_matches_flat(world, stride):
    ref, reads, truth = world
    cfg = AlignConfig(genome_kmer=11, index_stride=stride,
                      gapped_refine=False)
    flat = GenomeAligner(ref, cfg=cfg)
    xl = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256)
    a = flat.align(reads)
    b = xl.align(reads)
    assert b.mapped.all()
    np.testing.assert_array_equal(a.ref_start, b.ref_start)
    np.testing.assert_array_equal(a.ref_end, b.ref_end)
    np.testing.assert_array_equal(a.strand, b.strand)
    np.testing.assert_array_equal(a.score, b.score)
    np.testing.assert_array_equal(a.matches, b.matches)
    np.testing.assert_array_equal(b.ref_start, truth)


def test_xl_multi_matches_flat(world):
    ref, reads, truth = world
    cfg = AlignConfig(genome_kmer=11, index_stride=2, gapped_refine=False)
    flat = GenomeAligner(ref, cfg=cfg)
    xl = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256)
    a = flat.align_multi(reads, min_score=30, min_seg_len=20, top_k=4)
    b = xl.align_multi(reads, min_score=30, min_seg_len=20, top_k=4)
    key = lambda mh: sorted(zip(mh.read_id.tolist(), mh.strand.tolist(),
                                mh.ref_start.tolist(), mh.q_start.tolist(),
                                mh.score.tolist()))
    assert key(a) == key(b)


def test_index_merge_matches_single_shard_build(rng):
    """The multi-shard device merge must equal a one-shot build: same bucket
    table, same bucket-grouped positions in global genome order."""
    seq = random_dna(np.random.default_rng(5), 40_000)
    codes = encode_ascii(seq)
    t1, p1 = build_index_xl(codes, k=8, stride=2, build_shards=1)
    t3, p3 = build_index_xl(codes, k=8, stride=2, build_shards=3)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))


def test_tiles_cover_genome_with_halo():
    codes = encode_ascii(random_dna(np.random.default_rng(6), 1000))
    tiles = build_tiles_host(codes, C=256, halo=32)
    assert tiles.shape == (4 + 1, 256 + 64)
    # interior halo equals the neighbouring tile's content
    np.testing.assert_array_equal(tiles[1, :32], tiles[0, 256:256 + 32])
    np.testing.assert_array_equal(tiles[0, 32:32 + 256], codes[:256])
    assert (tiles[-1] == 5).all()
