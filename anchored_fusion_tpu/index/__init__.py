"""Seed indexes: k-mer index over genome-scale references (shardable)."""

from anchored_fusion_tpu.index.kmer import KmerIndex  # noqa: F401
