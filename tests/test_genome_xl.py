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


def test_xl_two_pass_matches_single_pass(world):
    """On a repeat-free genome no bucket exceeds the pass-1 hit cap, so the
    two-pass path must reproduce the single-pass placements exactly (the
    reduced pass-1 top_k may only alter second_score for confident reads)."""
    ref, reads, truth = world
    base = AlignConfig(genome_kmer=11, index_stride=2, gapped_refine=False)
    two = dataclasses.replace(base, xl_two_pass=True)
    xl1 = GenomeAlignerXL(ref, cfg=base, tile_c=TILE, halo=256)
    xl2 = GenomeAlignerXL(ref, cfg=two, tile_c=TILE, halo=256)
    a = xl1.align(reads)
    b = xl2.align(reads)
    for f in ("score", "strand", "read_start", "read_end", "ref_start",
              "ref_end", "matches", "length", "mapped"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)


def test_xl_two_pass_rescues_crowded_buckets(rng):
    """A high-copy repeat family crowds k-mer buckets past the pass-1 cap;
    reads from UNIQUE regions whose k-mers also occur in the family must be
    caught by the confidence gate and rescued at the full hit cap."""
    seg = random_dna(rng, 400)
    uniq = random_dna(rng, 40_000)
    # 12 copies of the segment -> every segment k-mer's bucket overflows
    # H=4 AND H=8; embed one MUTATED near-copy in unique sequence so reads
    # from it share most k-mers with the family but have a unique placement
    near = list(seg)
    for p in range(0, len(near), 9):
        near[p] = "ACGT"[(("ACGT".index(near[p])) + 1) % 4]
    near = "".join(near)
    genome = uniq[:20_000] + (seg * 12) + uniq[20_000:] + near
    ref = reference_from_dict({"c": genome})
    near_start = len(genome) - len(near)
    reads, truth = [], []
    for off in range(0, 280, 40):
        reads.append(encode_ascii(genome[near_start + off:
                                         near_start + off + 101], length=128))
        truth.append(near_start + off)
    for off in range(0, 2000, 400):   # plain unique reads too
        reads.append(encode_ascii(genome[off:off + 101], length=128))
        truth.append(off)
    reads = np.stack(reads)
    cfg = dataclasses.replace(
        AlignConfig(genome_kmer=11, index_stride=2, gapped_refine=False),
        xl_two_pass=True, xl_rescue_hits=16)
    xl = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256)
    res = xl.align(reads)
    assert res.mapped.all()
    np.testing.assert_array_equal(res.ref_start, truth)


def test_xl_mesh_matches_single_device(world):
    """XL on a (2,2) CPU mesh (index replicated, reads sharded over all
    axes) must equal the single-device XL bit for bit (VERDICT r4 #8 —
    mesh x XL is the multi-chip hg38 operating point)."""
    import jax
    from anchored_fusion_tpu.parallel.mesh import make_mesh
    ref, reads, truth = world
    cfg = AlignConfig(genome_kmer=11, index_stride=2, gapped_refine=False)
    mesh = make_mesh((2, 2), devices=jax.devices("cpu")[:4])
    xl1 = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256)
    xlm = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256, mesh=mesh)
    a, b = xl1.align(reads), xlm.align(reads)
    for f in ("score", "strand", "read_start", "read_end", "ref_start",
              "ref_end", "matches", "length", "second_score", "mapped"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)
    ma, mb = xl1.align_multi(reads), xlm.align_multi(reads)
    for f in dataclasses.fields(ma):
        np.testing.assert_array_equal(getattr(ma, f.name),
                                      getattr(mb, f.name), f.name)


def test_pipeline_engine_selection():
    """The pipeline's genome-engine choice (mesh x size x stride)."""
    from anchored_fusion_tpu.pipeline import genome_engine_kind
    G = 3_100_000_000
    assert genome_engine_kind(G, 8, 0) == "xl"
    assert genome_engine_kind(G, 8, 1) == "xl-mesh"   # dp-only mesh
    assert genome_engine_kind(G, 8, 2) == "xl-mesh"   # mp>1 but XL fits
    assert genome_engine_kind(G, 1, 2) == "sharded-mesh"  # dense: capacity
    assert genome_engine_kind(G, 1, 0) == "sharded"
    # per-device HBM gate: an XL index past the device budget must not be
    # replicated when an mp capacity split is available (VERDICT/r5 review)
    assert genome_engine_kind(G, 8, 2, genome_kmer=14,
                              device_bytes=4 * 2**30) == "sharded-mesh"
    # ...but a dp-only mesh has no split axis: residency is the same
    # either way, so it stays xl-mesh
    assert genome_engine_kind(G, 8, 1, genome_kmer=14,
                              device_bytes=4 * 2**30) == "xl-mesh"
    assert genome_engine_kind(300_000, 1, 0) == "flat"
    assert genome_engine_kind(300_000, 1, 2) == "sharded-mesh"
    assert genome_engine_kind(300_000, 1, 1) == "flat"  # dp mesh, flat engine


def test_xl_two_pass_unmappable_reads(rng):
    """Reads with no placement anywhere all fail the confidence gate, go
    through the rescue pass, and come back unmapped (not crashed, not
    spuriously mapped)."""
    ref = reference_from_dict({"c": random_dna(rng, 100_000)})
    cfg = dataclasses.replace(
        AlignConfig(genome_kmer=11, index_stride=2, gapped_refine=False),
        xl_two_pass=True)
    xl = GenomeAlignerXL(ref, cfg=cfg, tile_c=TILE, halo=256)
    garbage = np.stack([encode_ascii(random_dna(rng, 101), length=128)
                        for _ in range(8)])
    res = xl.align(garbage)
    assert not res.mapped.any()
