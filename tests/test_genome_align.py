import numpy as np
import jax.numpy as jnp

from anchored_fusion_tpu.index.kmer import (
    KmerIndex, pack_kmers_host, pack_read_kmers, lookup_hits, vote_diagonals)
from anchored_fusion_tpu.align.genome import GenomeAligner
from anchored_fusion_tpu.io.fasta import reference_from_dict
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str, revcomp
from anchored_fusion_tpu.bench.simulate import make_synthetic_genome, random_seq


def test_pack_kmers_host_basic():
    codes = encode_ascii("ACGTACGT")
    keys = pack_kmers_host(codes, 4)
    assert len(keys) == 5
    # ACGT = 0*64 + 1*16 + 2*4 + 3 = 27
    assert keys[0] == 27
    assert keys[4] == 27
    # N poisons its windows
    keys = pack_kmers_host(encode_ascii("ACGTNACGT"), 4)
    assert (keys[1:5] == -1).all()
    assert keys[0] == 27 and keys[5] == 27


def test_kmer_index_lookup():
    rng = np.random.default_rng(1)
    seq = random_seq(rng, 5000)
    ref = reference_from_dict({"c": seq})
    idx = KmerIndex.build(ref.seq, 13)
    # query a k-mer that occurs at position 1234
    reads = encode_ascii(seq[1234:1234 + 13], length=16)[None]
    keys, valid = pack_read_kmers(jnp.asarray(reads), jnp.asarray([0], dtype=jnp.int32), 13)
    pos, ok = lookup_hits(idx.keys_sorted, idx.pos_sorted, keys, valid, 8)
    hits = np.asarray(pos)[np.asarray(ok)]
    assert 1234 in hits


def test_vote_diagonals():
    diags = jnp.asarray([[100, 100, 100, 250, 250, 7, 0]])
    valid = jnp.asarray([[True, True, True, True, True, True, False]])
    d, v = vote_diagonals(diags, valid, 3)
    d, v = np.asarray(d), np.asarray(v)
    assert d[0, 0] == 100 and v[0, 0] == 3
    assert d[0, 1] == 250 and v[0, 1] == 2
    assert v[0, 2] == 1 and d[0, 2] == 7


def test_genome_aligner_exact_and_rc():
    rng = np.random.default_rng(2)
    seq = random_seq(rng, 50_000)
    ref = reference_from_dict({"c": seq})
    ga = GenomeAligner(ref)
    fwd = encode_ascii(seq[30_000:30_101], length=128)
    rc = encode_ascii(decode_to_str(revcomp(encode_ascii(seq[40_000:40_101]))), length=128)
    res = ga.align(np.stack([fwd, rc]))
    assert res.mapped.all()
    assert res.strand[0] == 0 and res.ref_start[0] == 30_000 and res.ref_end[0] == 30_100
    assert res.strand[1] == 1 and res.ref_start[1] == 40_000 and res.ref_end[1] == 40_100


def test_genome_aligner_chimeric_clip():
    rng = np.random.default_rng(3)
    seq = random_seq(rng, 60_000)
    ref = reference_from_dict({"c": seq})
    ga = GenomeAligner(ref)
    # read: 50bp from locus A + 51bp from locus B (a genomic chimera)
    read = seq[10_000:10_050] + seq[45_000:45_051]
    res = ga.align(encode_ascii(read, length=128)[None], min_score=20)
    assert res.mapped[0]
    # best single segment covers one side only
    assert res.length[0] in range(45, 57)


def test_genome_aligner_on_synthetic_gene_transcript():
    """Reads from a spliced transcript align exon-locally on the genome."""
    rng = np.random.default_rng(4)
    sg = make_synthetic_genome(rng, n_genes=4)
    gene = sg.genes["GENE0"]
    tx = gene.transcript(sg.genome)
    # take a read fully inside the first exon
    ex_s, ex_e = gene.exons[0]
    if gene.strand == "-":
        ex_s, ex_e = gene.exons[-1]
    exon_seq = sg.genome.fetch_str("chr1", ex_s, ex_e)
    read = exon_seq[10:10 + 101]
    ga = GenomeAligner(sg.genome)
    res = ga.align(encode_ascii(read, length=128)[None])
    assert res.mapped[0]
    assert res.ref_start[0] == sg.genome.to_global("chr1", ex_s) + 10


def test_table_lookup_matches_binary_search():
    """lookup_hits_table (direct-address) parity with lookup_hits."""
    from anchored_fusion_tpu.index.kmer import (
        lookup_hits_table, pack_read_kmers_strided, read_kmer_offsets)
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 20000)
    ref = reference_from_dict({"c": seq})
    idx = KmerIndex.build(ref.seq, 13)
    assert idx.kb <= 13
    reads = np.stack([encode_ascii(seq[p:p + 101], length=128)
                      for p in (500, 7000, 15000)])
    offsets = read_kmer_offsets(128, 13, 6)
    keys, valid = pack_read_kmers_strided(jnp.asarray(reads), 13, 6)
    keys2, valid2 = pack_read_kmers(
        jnp.asarray(reads), jnp.asarray(offsets), 13)
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(keys2))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))
    pos_t, ok_t = lookup_hits_table(idx.table, idx.keys_sorted, idx.pos_sorted,
                                    keys, valid, 8, 13, idx.kb)
    pos_b, ok_b = lookup_hits(idx.keys_sorted, idx.pos_sorted, keys, valid, 8)
    # same hit sets (table may order-pad differently only in invalid slots)
    for r in range(reads.shape[0]):
        for q in range(keys.shape[1]):
            ht = set(np.asarray(pos_t)[r, q][np.asarray(ok_t)[r, q]])
            hb = set(np.asarray(pos_b)[r, q][np.asarray(ok_b)[r, q]])
            assert ht == hb


def test_bucket_bits_scale_with_reference():
    from anchored_fusion_tpu.index.kmer import bucket_bits_for
    assert bucket_bits_for(1000, 13) < 13        # small ref -> small table
    assert bucket_bits_for(40_000_000, 13) == 13  # large ref -> exact table
    assert bucket_bits_for(0, 13) == 1


def test_small_kb_key_check_rejects_bucket_collisions():
    """With kb < k, hits from other keys sharing the bucket are filtered."""
    from anchored_fusion_tpu.index.kmer import (
        KmerIndex, lookup_hits_table, pack_read_kmers_strided)
    # two k-mers sharing a 2-base bucket prefix (kb=2): AAAA-prefix
    seq = "AAAACCCC" + "AAAAGGGG" + "TTTTTTTT"
    ref = reference_from_dict({"c": seq})
    idx = KmerIndex.build(ref.seq, 4, bucket_bases=2)
    q = encode_ascii("AAAACCCC", length=8)[None]
    keys, valid = pack_read_kmers_strided(jnp.asarray(q), 4, 4)
    pos, ok = lookup_hits_table(idx.table, idx.keys_sorted, idx.pos_sorted,
                                keys, valid, 8, 4, idx.kb)
    hits0 = set(np.asarray(pos)[0, 0][np.asarray(ok)[0, 0]])  # key AAAA
    assert 0 in hits0 and 8 in hits0          # both AAAA occurrences
    hits1 = set(np.asarray(pos)[0, 1][np.asarray(ok)[0, 1]])  # key CCCC
    assert hits1 == {4}


def test_genome_aligner_rejects_int32_overflow_genomes():
    """Genomes past int32 coordinate range (hg38 = 3.1Gbp) must be refused by
    the flat index with a pointer to the sharded aligner, whose shard-local
    int32 coords + host int64 fold stay exact at any size."""
    import numpy as np
    import pytest
    from anchored_fusion_tpu.align.genome import GenomeAligner
    from anchored_fusion_tpu.io.fasta import Reference

    class HugeRef(Reference):
        @property
        def total_length(self):
            return 3_100_000_000

    ref = HugeRef(names=["chr1"], starts=np.array([0]),
                  lengths=np.array([3_100_000_000]),
                  seq=np.zeros(16, np.int8))
    with pytest.raises(ValueError, match="ShardedGenomeAligner"):
        GenomeAligner(ref)


def test_strided_index_positions_and_recall():
    """Sparse (BLAT-style) index build: positions are true genome coords at
    stride multiples; a dense read-side query (auto stride 1) keeps exact
    placement for clean reads — the hg38-scale residency mode."""
    import dataclasses
    from anchored_fusion_tpu.config import AlignConfig
    from anchored_fusion_tpu.index.kmer import build_index_arrays

    rng = np.random.default_rng(7)
    seq = random_seq(rng, 20_000)
    ref = reference_from_dict({"c": seq})
    kv, pos, table, kb = build_index_arrays(ref.seq, 13, stride=4)
    # every stored position is a stride multiple and its key re-packs exactly
    assert (pos % 4 == 0).all()
    dense_kv, dense_pos, _, _ = build_index_arrays(ref.seq, 13)
    lut = dict(zip(dense_pos.tolist(), dense_kv.tolist()))
    for p, k in zip(pos[:100].tolist(), kv[:100].tolist()):
        assert lut[p] == k

    cfg = AlignConfig(index_stride=4)
    assert cfg.resolved_query_stride() == 1
    ga = GenomeAligner(ref, cfg=cfg)
    assert ga.index_stride == 4 and ga.stride == 1
    fwd = encode_ascii(seq[5_000:5_101], length=128)
    rc = encode_ascii(
        decode_to_str(revcomp(encode_ascii(seq[9_001:9_102]))), length=128)
    res = ga.align(np.stack([fwd, rc]))
    assert res.mapped.all()
    assert res.ref_start[0] == 5_000 and res.ref_end[0] == 5_100
    assert res.ref_start[1] == 9_001 and res.ref_end[1] == 9_101


def test_strided_sharded_matches_flat():
    """ShardedGenomeAligner honors index_stride and stays coordinate-exact."""
    from anchored_fusion_tpu.config import AlignConfig
    from anchored_fusion_tpu.parallel.sharded_genome import ShardedGenomeAligner

    rng = np.random.default_rng(8)
    seq = random_seq(rng, 30_000)
    ref = reference_from_dict({"c": seq})
    cfg = AlignConfig(index_stride=3)
    flat = GenomeAligner(ref, cfg=cfg)
    shard = ShardedGenomeAligner(ref, n_shards=3, cfg=cfg)
    assert shard.index_stride == 3 and shard.stride == 1
    reads = np.stack([
        encode_ascii(seq[o:o + 101], length=128)
        for o in (1_000, 12_345, 22_222, 29_800)])
    r1 = flat.align(reads)
    r2 = shard.align(reads)
    assert (np.asarray(r1.mapped)[:3]).all()
    np.testing.assert_array_equal(r1.ref_start[:3], r2.ref_start[:3])
    np.testing.assert_array_equal(r1.ref_end[:3], r2.ref_end[:3])
