"""Sharded genome index: vmap fallback == single index == mesh path."""

import numpy as np
import pytest
import jax

from anchored_fusion_tpu.align.genome import GenomeAligner
from anchored_fusion_tpu.parallel.sharded_genome import ShardedGenomeAligner
from anchored_fusion_tpu.parallel.mesh import make_mesh
from anchored_fusion_tpu.io.fasta import reference_from_dict
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str, revcomp
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def world(rng):
    seq = random_dna(rng, 80_000)
    ref = reference_from_dict({"c": seq})
    reads = []
    truth = []
    for i in range(48):
        start = int(rng.integers(0, 79_000))
        sub = seq[start:start + 101]
        if i % 3 == 0:
            sub = decode_to_str(revcomp(encode_ascii(sub)))
        reads.append(encode_ascii(sub, length=128))
        truth.append(start)
    # one read crossing a shard boundary (4 shards => boundary at 20k)
    reads.append(encode_ascii(seq[19_950:20_051], length=128))
    truth.append(19_950)
    return ref, np.stack(reads), truth


def test_sharded_vmap_matches_single_index(world):
    ref, reads, truth = world
    single = GenomeAligner(ref)
    sharded = ShardedGenomeAligner(ref, n_shards=4)
    a = single.align(reads)
    b = sharded.align(reads)
    assert b.mapped.all()
    np.testing.assert_array_equal(a.ref_start, b.ref_start)
    np.testing.assert_array_equal(a.ref_end, b.ref_end)
    np.testing.assert_array_equal(a.strand, b.strand)
    np.testing.assert_array_equal(b.ref_start, truth)


def test_sharded_mesh_path_matches(world):
    ref, reads, truth = world
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual cpu devices")
    mesh = make_mesh((1, 4), devices=devs[:4])
    sharded = ShardedGenomeAligner(ref, n_shards=4, mesh=mesh)
    b = sharded.align(reads)
    assert b.mapped.all()
    np.testing.assert_array_equal(b.ref_start, truth)


def test_device_build_matches_host_build():
    """The on-chip index build (argsort + sort-method searchsorted, sentinel
    invalid windows) must align identically to the host numpy build — same
    best hits, coordinates, and mapped flags, dense and strided."""
    import dataclasses
    import numpy as np
    from anchored_fusion_tpu.config import AlignConfig
    from anchored_fusion_tpu.io.fasta import reference_from_dict
    from anchored_fusion_tpu.parallel.sharded_genome import ShardedGenomeAligner
    from anchored_fusion_tpu.ops.encode import encode_ascii
    from anchored_fusion_tpu.bench.simulate import random_seq

    rng = np.random.default_rng(21)
    seq = random_seq(rng, 40_000)
    # plant an N-run so invalid-window (sentinel) handling is exercised
    seq = seq[:7_000] + "N" * 50 + seq[7_050:]
    ref = reference_from_dict({"c": seq})
    reads = np.stack([
        encode_ascii(seq[o:o + 101], length=128)
        for o in (1_000, 13_000, 26_000, 39_000 - 101)])
    for stride in (1, 3):
        cfg = AlignConfig(index_stride=stride)
        host = ShardedGenomeAligner(ref, n_shards=3, cfg=cfg,
                                    device_build=False)
        dev = ShardedGenomeAligner(ref, n_shards=3, cfg=cfg,
                                   device_build=True)
        r_h = host.align(reads)
        r_d = dev.align(reads)
        for f in dataclasses.fields(type(r_h)):
            np.testing.assert_array_equal(
                getattr(r_h, f.name), getattr(r_d, f.name), err_msg=f.name)
        mh_h = host.align_multi(reads)
        mh_d = dev.align_multi(reads)
        for f in dataclasses.fields(type(mh_h)):
            np.testing.assert_array_equal(
                getattr(mh_h, f.name), getattr(mh_d, f.name), err_msg=f.name)
