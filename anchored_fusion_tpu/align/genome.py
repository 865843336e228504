"""Genome-scale read alignment: k-mer seeding + Kadane extension.

The genome-side counterpart of ``align_to_reference``: replaces every
``bwa mem``/BLAT invocation against the whole-genome reference (mate rescue
Anchored_Fusion.py:188, multi-mapper rescue functions.py:716, fine blocks
:530, junction linearity :1244, negative mining :1522).  Seeds come from the
sorted k-mer index (index/kmer.py) instead of the all-diagonal matmul; the
extension path (Kadane over gathered windows, strand folding) is shared with
the small-reference engine, so both emit identical AlignmentResult records.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from anchored_fusion_tpu.config import AlignConfig
from anchored_fusion_tpu.io.fasta import Reference
from anchored_fusion_tpu.index.kmer import (
    KmerIndex, pack_read_kmers_strided, lookup_hits_table, vote_diagonals,
    read_kmer_offsets)
from anchored_fusion_tpu.ops.encode import PAD
from anchored_fusion_tpu.align.aligner import (
    AlignmentResult, MultiHits, both_strands, extend_diagonals,
    extend_diagonals_all, fold_strands, _flatten_multi,
    stack_result, unstack_result, stack_multi, unstack_multi,
    _INFLIGHT_CHUNKS)


def _seed_diagonals(flat, table, index_keys, index_pos, offsets,
                    k: int, kb: int, stride: int, max_hits: int, top_k: int):
    """Shared seeding: strided k-mer keys -> table hit lookup -> diagonal vote.

    Returns (2B, top_k) candidate ref offsets of read position 0 (sentinel for
    empty vote slots).
    """
    N = flat.shape[0]
    keys, kvalid = pack_read_kmers_strided(flat, k, stride)  # (2B, Q)
    pos, hvalid = lookup_hits_table(table, index_keys, index_pos, keys,
                                    kvalid, max_hits, k, kb)
    # candidate diagonal = hit position - k-mer offset in read
    diags = pos - offsets[None, :, None]                     # (2B, Q, H)
    C = diags.shape[1] * diags.shape[2]
    diag, votes = vote_diagonals(diags.reshape(N, C),
                                 hvalid.reshape(N, C), top_k)
    return jnp.where(votes > 0, diag, jnp.int32(-(2 ** 30) // 2))


@functools.partial(jax.jit, static_argnames=(
    "k", "kb", "stride", "max_hits", "top_k", "match", "mismatch", "R",
    "prepad"))
def _genome_align_core(packed, ref, table, index_keys, index_pos, offsets,
                       k: int, kb: int, stride: int, max_hits: int,
                       top_k: int, match: int, mismatch: int, R: int,
                       prepad: int):
    from anchored_fusion_tpu.ops.encode import unpack_nibbles
    reads = unpack_nibbles(packed, R)  # nibble-packed over the slow relay
    B = reads.shape[0]
    flat, coord_off = both_strands(reads)                    # (2B, R)
    offs = _seed_diagonals(flat, table, index_keys, index_pos, offsets,
                           k, kb, stride, max_hits, top_k)
    cand = extend_diagonals(flat, ref, offs, match, mismatch,
                            ref_prepad=prepad)
    return stack_result(fold_strands(cand, B, coord_off))


@functools.partial(jax.jit, static_argnames=(
    "k", "kb", "stride", "max_hits", "top_k", "match", "mismatch", "R",
    "prepad"))
def _genome_align_multi_core(packed, ref, table, index_keys, index_pos, offsets,
                             k: int, kb: int, stride: int, max_hits: int,
                             top_k: int, match: int, mismatch: int, R: int,
                             prepad: int):
    from anchored_fusion_tpu.ops.encode import unpack_nibbles
    reads = unpack_nibbles(packed, R)
    flat, _ = both_strands(reads)
    offs = _seed_diagonals(flat, table, index_keys, index_pos, offsets,
                           k, kb, stride, max_hits, top_k)
    seg = extend_diagonals_all(flat, ref, offs, match, mismatch,
                               ref_prepad=prepad)
    seg["off"] = offs
    return stack_multi(seg)


class GenomeAligner:
    """Holds the genome codes + k-mer index and aligns read batches."""

    def __init__(self, reference: Reference, cfg: Optional[AlignConfig] = None,
                 kmer: Optional[int] = None, stride: Optional[int] = None,
                 device_build: Optional[bool] = None, mesh=None):
        """``mesh``: replicate the index over the mesh and dp-shard every
        read chunk over its FIRST axis — the production multi-chip genome
        layout (a strided whole-genome index fits one v5e chip, so read data
        parallelism with a replicated index beats splitting the index; the
        mp axis in parallel/sharded_genome remains for genomes that exceed
        one device's HBM).  XLA partitions the jitted core from the input
        shardings; no collectives are needed (records stay dp-sharded)."""
        self.cfg = cfg or AlignConfig()
        self.reference = reference
        self.mesh = mesh
        if reference.total_length > 2**31 - 2**20:
            # the flat index keeps int32 genome positions; past ~2.1Gbp use
            # the sharded index (shard-local int32 + host int64 fold), which
            # also runs single-device via its vmap fallback
            raise ValueError(
                f"genome is {reference.total_length} bp (> int32 coordinate "
                "range); use parallel.sharded_genome.ShardedGenomeAligner "
                "with n_shards >= 2")
        self.k = kmer or self.cfg.genome_kmer
        self.index_stride = getattr(self.cfg, "index_stride", 1)
        self.stride = stride or self.cfg.resolved_query_stride()
        if device_build is None:
            # past ~200Mbp the host radix sort dominates; build on the chip
            device_build = reference.total_length > 200_000_000
        # codes are stored PREPADDED (REF_PREPAD each side) so extension can
        # slice windows directly; positions in the index stay genome-frame
        from anchored_fusion_tpu.align.aligner import REF_PREPAD
        self.ref_prepad = REF_PREPAD
        if device_build:
            from anchored_fusion_tpu.index.kmer import (
                build_shard_index_device, bucket_bits_for)
            codes = jnp.asarray(reference.seq)
            L = reference.total_length
            m = -(-(L - self.k + 1) // self.index_stride)
            kb = bucket_bits_for(m, self.k)
            ks, ps, tb = build_shard_index_device(
                codes, self.k, kb, self.index_stride)
            self.index = KmerIndex(
                k=self.k, kb=kb, table=tb,
                keys_sorted=(ks if ks is not None
                             else jnp.zeros(1, jnp.int32)),
                pos_sorted=ps, ref_len=L)
            self.codes = jnp.pad(codes, self.ref_prepad,
                                 constant_values=PAD)
        else:
            self.index = KmerIndex.build(reference.seq, self.k,
                                         stride=self.index_stride)
            self.codes = jnp.asarray(np.pad(
                np.asarray(reference.seq), self.ref_prepad,
                constant_values=PAD))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            put = lambda a: jax.device_put(np.asarray(a), rep)
            self.index = KmerIndex(
                k=self.index.k, kb=self.index.kb, table=put(self.index.table),
                keys_sorted=put(self.index.keys_sorted),
                pos_sorted=put(self.index.pos_sorted),
                ref_len=self.index.ref_len)
            self.codes = put(self.codes)

    def align(self, seqs: np.ndarray, min_score: Optional[int] = None,
              min_identity: float = 0.0, min_seg_len: Optional[int] = None,
              top_k: Optional[int] = None, max_hits: Optional[int] = None,
              chunk: int = 8192) -> AlignmentResult:
        cfg = self.cfg
        if min_score is None:
            min_score = cfg.min_align_score
        if min_seg_len is None:
            min_seg_len = cfg.min_seg_len
        top_k = top_k or cfg.top_diagonals
        max_hits = max_hits or cfg.max_hits_per_kmer
        seqs = np.asarray(seqs, dtype=np.int8)
        if seqs.ndim == 1:
            seqs = seqs[None]
        if seqs.shape[1] % 2:  # even width for nibble packing
            seqs = np.concatenate(
                [seqs, np.full((seqs.shape[0], 1), PAD, np.int8)], axis=1)
        B, R = seqs.shape
        dp_sh = None
        batch_mult = 128
        if self.mesh is not None:
            import math
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = self.mesh.shape[self.mesh.axis_names[0]]
            dp_sh = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            batch_mult = math.lcm(128, dp)
            chunk = -(-chunk // batch_mult) * batch_mult
        offsets = (jnp.asarray(read_kmer_offsets(R, self.k, self.stride))
                   if self.mesh is None else jax.device_put(
                       read_kmer_offsets(R, self.k, self.stride),
                       jax.sharding.NamedSharding(
                           self.mesh, jax.sharding.PartitionSpec())))
        from anchored_fusion_tpu.ops.encode import pack_nibbles
        # grouped result pulls (same pattern as aligner.align_to_reference):
        # each pull is a relay round trip while the per-chunk result is tiny,
        # so up to 8 chunk results stack device-side and cross as one array
        from anchored_fusion_tpu.align.aligner import GroupedPuller
        puller = GroupedPuller(
            lambda a, n_r: {n: v[:n_r]
                            for n, v in unstack_result(a).items()})
        _push = puller.push

        for lo in range(0, B, chunk):
            sub = seqs[lo:lo + chunk]
            n_real = sub.shape[0]
            if n_real < chunk:
                target = (chunk if B > chunk
                          else -(-n_real // batch_mult) * batch_mult)
                if target != n_real:
                    sub = np.concatenate(
                        [sub, np.full((target - n_real, R), PAD, np.int8)], axis=0)
            packed = pack_nibbles(sub)
            if dp_sh is not None:
                packed = jax.device_put(packed, dp_sh)
            _push(n_real, _genome_align_core(
                packed, self.codes, self.index.table,
                self.index.keys_sorted, self.index.pos_sorted, offsets,
                self.k, self.index.kb, self.stride, max_hits, top_k,
                cfg.match_score, cfg.mismatch_penalty, R, self.ref_prepad))
        outs = puller.finish()
        cat = {n: np.concatenate([o[n] for o in outs]) for n in outs[0]}
        length = cat["length"]
        matches = cat["matches"]
        ident = matches / np.maximum(length, 1)
        mapped = ((cat["score"] >= min_score) & (length >= min_seg_len)
                  & (ident >= min_identity))
        res = AlignmentResult(
            score=cat["score"].astype(np.int32),
            strand=cat["strand"].astype(np.int8),
            read_start=cat["read_start"].astype(np.int32),
            read_end=cat["read_end"].astype(np.int32),
            ref_start=cat["ref_start"].astype(np.int64),
            ref_end=cat["ref_end"].astype(np.int64),
            matches=matches.astype(np.int32),
            length=length.astype(np.int32),
            second_score=cat["second_score"].astype(np.int32),
            mapped=mapped,
        )
        if getattr(cfg, "gapped_refine", False):
            from anchored_fusion_tpu.align.refine import refine_result
            res = refine_result(res, seqs, self.reference.seq, cfg,
                                min_score, min_identity, min_seg_len)
        return res

    def align_multi(self, seqs: np.ndarray, min_score: int = 20,
                    min_identity: float = 0.0, min_seg_len: int = 10,
                    top_k: int = 8, max_hits: Optional[int] = None,
                    chunk: int = 1024) -> MultiHits:
        """All-hits genome alignment (one BLAT pass over the genome)."""
        cfg = self.cfg
        max_hits = max_hits or cfg.max_hits_per_kmer
        seqs = np.asarray(seqs, dtype=np.int8)
        if seqs.ndim == 1:
            seqs = seqs[None]
        if seqs.shape[1] % 2:  # even width for nibble packing
            seqs = np.concatenate(
                [seqs, np.full((seqs.shape[0], 1), PAD, np.int8)], axis=1)
        B, R = seqs.shape
        offsets = jnp.asarray(read_kmer_offsets(R, self.k, self.stride))
        from anchored_fusion_tpu.ops.encode import pack_nibbles
        pending = []
        parts = []
        for lo in range(0, B, chunk):
            sub = seqs[lo:lo + chunk]
            n_real = sub.shape[0]
            if n_real < chunk:
                target = chunk if B > chunk else -(-n_real // 64) * 64
                if target != n_real:
                    sub = np.concatenate(
                        [sub, np.full((target - n_real, R), PAD, np.int8)], axis=0)
            # async dispatch with a bounded in-flight window; host-side
            # flatten happens at collect time
            pending.append((lo, n_real, sub, _genome_align_multi_core(
                pack_nibbles(sub), self.codes, self.index.table,
                self.index.keys_sorted, self.index.pos_sorted, offsets,
                self.k, self.index.kb, self.stride, max_hits, top_k,
                cfg.match_score, cfg.mismatch_penalty, R, self.ref_prepad)))
            if len(pending) > _INFLIGHT_CHUNKS:
                parts.append(self._collect_multi(*pending.pop(0), top_k,
                                                 min_score, min_identity,
                                                 min_seg_len, R))
        parts.extend(self._collect_multi(*p, top_k, min_score, min_identity,
                                         min_seg_len, R) for p in pending)
        return MultiHits(**{
            f.name: np.concatenate([getattr(p, f.name) for p in parts])
            for f in dataclasses.fields(MultiHits)})

    @staticmethod
    def _collect_multi(lo, n_real, sub, st, top_k, min_score, min_identity,
                       min_seg_len, R) -> MultiHits:
        """Pull one dispatched align_multi chunk to host and flatten it."""
        seg = unstack_multi(np.asarray(st))
        read_lens = (sub != PAD).sum(axis=1).astype(np.int32)
        mh = _flatten_multi(seg, read_lens, sub.shape[0], top_k, min_score,
                            min_identity, min_seg_len, R)
        sel = mh.read_id < n_real
        return MultiHits(**{
            f.name: getattr(mh, f.name)[sel] if f.name != "read_id"
            else mh.read_id[sel] + lo
            for f in dataclasses.fields(MultiHits)})
