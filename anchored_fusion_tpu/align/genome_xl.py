"""Single-chip genome aligner for references past the int32 coordinate limit.

Replaces `bwa mem` whole-genome passes (Anchored_Fusion.py:102/:188,
functions.py:716) at hg38 scale on ONE chip.  The round-3 design looped a
per-shard program over S index shards (parallel/sharded_genome.py
single-device path), paying the seeding stage S times; profiling (docs/
PERFORMANCE.md round 4) shows that stage — the per-k-mer hit-position gather
— IS the genome stage (this runtime executes XLA gathers at ~60M indices/s
regardless of locality), so querying one MERGED index is the structural fix:
lookups + voting + extension run once per chunk instead of once per shard.

Two int32 walls fall to two representation changes:

  * **Hit positions** are stored as ``pos // index_stride`` ("pos_div").
    Positions in a strided index are stride-multiples, so this is lossless
    and keeps hg38 (3.1e9 / 4 = 775M) far inside int32.
  * **Extension windows** slice from a 2D-tiled genome ``(T, C + 2*halo)``
    with halo'd tile edges: ``dynamic_slice(tiles, (row, col+halo), (1, R))``
    uses only in-tile (int32) indices; the halo (>= read width) makes
    boundary-crossing windows whole.  Diagonals are voted as (row, col)
    PAIRS via one fused two-key ``lax.sort`` (kmer.vote_diagonals2); the
    int64 fold ``row * C + col`` happens on host.

The index build reuses the per-shard on-chip sorts (index/kmer.py
build_shard_index_device) and merges them ON DEVICE: the global bucket table
is the SUM of the shard tables, and each shard slot's destination is
``iota + A_s[key]`` where ``A_s`` is a per-bucket offset vector — one gather
and one scatter per shard, no genome-sized host round trips.

The multi-chip mesh path keeps parallel/sharded_genome.py (shards there map
to devices); this class is the single-device hg38 operating point.
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
    build_shard_index_device, pack_read_kmers_strided, lookup_hits_table,
    vote_diagonals2, read_kmer_offsets)
from anchored_fusion_tpu.ops.encode import PAD
from anchored_fusion_tpu.ops import kadane
from anchored_fusion_tpu.align.aligner import (
    AlignmentResult, MultiHits, both_strands)


# Tile geometry: C columns of genome per tile row + halo on each side so any
# R-wide window whose diagonal lands in a row slices wholly inside it.  The
# halo bounds the widest admissible query (align/_check_width): 768 matches
# aligner.REF_PREPAD — junction-consensus batches reach 512 bp — and costs
# only ~1.5KB per 16M-column tile row.
TILE_C = 1 << 24
TILE_HALO = 768


def build_tiles_host(codes: np.ndarray, C: int = TILE_C,
                     halo: int = TILE_HALO) -> np.ndarray:
    """(T+1, C + 2*halo) int8 tiled genome; last row is the all-PAD sentinel
    row that invalid (zero-vote) candidates index."""
    L = len(codes)
    T = -(-L // C)
    W = C + 2 * halo
    out = np.full((T + 1, W), PAD, np.int8)
    for t in range(T):
        lo = t * C - halo
        hi = t * C + C + halo
        src_lo, src_hi = max(0, lo), min(L, hi)
        out[t, src_lo - lo:src_hi - lo] = codes[src_lo:src_hi]
    return out


def build_index_xl(codes: np.ndarray, k: int, stride: int,
                   build_shards: Optional[int] = None, verbose: bool = False):
    """Merged global k-mer index, built shard-wise on device.

    Returns (table (4^k+1,) int32 device, pos_div (n//stride,) int32 device).
    ``pos_div`` slots are bucket-grouped with intra-bucket entries in global
    genome order (shard-local sorts are stable and shards are concatenated
    in genome order inside each bucket).
    """
    L = len(codes)
    n = L - k + 1
    int32_safe = 2 ** 31 - 2 ** 20
    if build_shards is None:
        # each shard's sort temps (~16B/key) must fit HBM beside the merged
        # output; ~260M keys/shard matches the proven hg38 operating point
        build_shards = max(1, -(-(n // stride) // 260_000_000))
    per = -(-n // build_shards)
    per = -(-per // stride) * stride              # stride-aligned shard sizes
    assert per + k - 1 <= int32_safe
    kb = k                                        # exact table (genome scale)
    n_bucket = (1 << (2 * k)) + 1

    tables = []
    shard_parts = []                              # (keys_sorted, pos_div, m)
    for s in range(0, n, per):
        sl = codes[s:min(L, s + per + k - 1)]
        dev = jnp.asarray(sl)
        ks, ps, tb = build_shard_index_device(dev, k, kb, stride,
                                              keep_keys=True)
        del dev
        # ps = local_order * stride; global pos_div = s//stride + order
        pos_div = (ps // stride) + jnp.int32(s // stride)
        tables.append(tb)
        shard_parts.append((ks, pos_div))
        if verbose:
            print(f"[xl-build] shard @{s}: {ps.shape[0]} slots")
    table = tables[0]
    for tb in tables[1:]:
        table = table + tb
    # scatter each shard's slots to its merged destinations.  The scatter
    # DONATES the merged buffer (true in-place update): functional updates
    # would copy the multi-GB array per shard, and the resulting allocator
    # churn fragments HBM badly enough that the first post-build align
    # dispatch OOMs at hg38 scale even though residency is only ~6GiB.
    total = sum(int(p.shape[0]) for _, p in shard_parts)
    merged = jnp.zeros(total + 1, jnp.int32)      # +1 = dump slot (sentinels)
    prior = jnp.zeros(n_bucket - 1, jnp.int32)    # per-bucket counts so far
    for i in range(len(shard_parts)):
        ks, pos_div = shard_parts[i]
        tb = tables[i]
        # slot i of shard s (bucket b = ks[i], intra-rank i - tb[b]) lands at
        # global_table[b] + prior[b] + (i - tb[b])
        A = table[:-1] + prior - tb[:-1]
        m = pos_div.shape[0]
        valid_n = tb[-1]                          # sentinels sorted past it
        iota = jnp.arange(m, dtype=jnp.int32)
        dst = iota + A[jnp.clip(ks, 0, n_bucket - 2)]
        dst = jnp.where(iota < valid_n, dst, total)   # sentinels -> dump
        merged = _scatter_donate(merged, dst, pos_div)
        prior = prior + (tb[1:] - tb[:-1])
        shard_parts[i] = None                     # free ks/pos promptly
        del ks, pos_div, dst, A, iota
        jax.block_until_ready(merged)
    # keep the dump slot (avoids a genome-sized slice copy); lookups never
    # address it — table[-1] == total bounds every bucket range
    return table, merged


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_donate(merged, dst, src):
    return merged.at[dst].set(src)


def _pick(a, j):
    return jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]


def _xl_bucket(n: int, cap: int) -> int:
    """Bucketed batch pad so only pre-warmed shapes ever dispatch (every
    novel shape would COMPILE at full index residency — the OOM hazard the
    init-time warms exist to avoid)."""
    for b in (1024, 4096, 8192):
        if n <= b <= cap:
            return b
    return cap


# The seed (hit gather + vote) and extend (window slice + Kadane) phases run
# as SEPARATE programs: fused, XLA's operand-scale gather workspaces for the
# multi-GB pos_div AND tiles arrays coexist in one buffer assignment, which
# OOMs a 16GB chip at hg38 residency (6GB index).  The (rows, cols) candidate
# intermediate stays device-resident between the two dispatches.


@functools.partial(jax.jit, static_argnames=(
    "k", "kb", "stride_idx", "stride_q", "max_hits", "top_k", "T", "C", "R"))
def _xl_seed_core(packed, table, pos_div, read_offsets,
                  k: int, kb: int, stride_idx: int, stride_q: int,
                  max_hits: int, top_k: int, T: int, C: int, R: int):
    """Seed+vote: nibble-packed chunk -> (rows (2B,k), cols (2B,k))."""
    from anchored_fusion_tpu.ops.encode import unpack_nibbles
    reads = unpack_nibbles(packed, R)
    B = reads.shape[0]
    flat, _ = both_strands(reads)
    rk, kvalid = pack_read_kmers_strided(flat, k, stride_q)
    hit, hvalid = lookup_hits_table(table, jnp.zeros(1, jnp.int32), pos_div,
                                    rk, kvalid, max_hits, k, kb)
    rowdiv = C // stride_idx
    row = hit // rowdiv                                    # (2B, Q, H)
    colpos = (hit % rowdiv) * stride_idx
    col = colpos - read_offsets[None, :, None]
    Cc = col.shape[1] * col.shape[2]
    vrow, vcol, votes = vote_diagonals2(
        jnp.broadcast_to(row, col.shape).reshape(2 * B, Cc),
        col.reshape(2 * B, Cc), hvalid.reshape(2 * B, Cc), top_k)
    rows_c = jnp.where(votes > 0, jnp.clip(vrow, 0, T - 1), T)
    cols_c = jnp.where(votes > 0, vcol, 0)
    return rows_c, cols_c


def _xl_windows_and_segments(packed, tiles, rows_c, cols_c, halo, R,
                             match, mismatch):
    from anchored_fusion_tpu.ops.encode import unpack_nibbles
    reads = unpack_nibbles(packed, R)
    B = reads.shape[0]
    flat, coord_off = both_strands(reads)
    start = jnp.clip(cols_c + halo, 0, tiles.shape[1] - R)
    win = jax.vmap(jax.vmap(
        lambda r_, s_: jax.lax.dynamic_slice(tiles, (r_, s_), (1, R))[0]
    ))(rows_c, start)                                      # (2B, k, R)
    read_valid = (flat != PAD)[:, None, :]
    valid = (win != PAD) & read_valid
    sc, ism = kadane.segment_scores(
        jnp.broadcast_to(flat[:, None, :], win.shape), win, valid,
        match=match, mismatch=mismatch)
    seg = kadane.best_segment(sc, ism)                     # dict (2B, k)
    return seg, flat, coord_off, B


@functools.partial(jax.jit, static_argnames=(
    "top_k", "match", "mismatch", "halo", "R"))
def _xl_extend_core(packed, tiles, rows_c, cols_c,
                    top_k: int, match: int, mismatch: int, halo: int,
                    R: int):
    """Extend+fold: candidates -> stacked (10, B) int32 result
    (7 scalar fields + row, col_start, col_end; host folds
    ``ref = row*C + col`` in int64)."""
    seg, flat, coord_off, B = _xl_windows_and_segments(
        packed, tiles, rows_c, cols_c, halo, R, match, mismatch)
    order = jnp.argsort(-seg["score"], axis=1)
    b1 = order[:, 0]
    b2 = order[:, min(1, top_k - 1)]
    cand = {
        "score": _pick(seg["score"], b1),
        "second": (_pick(seg["score"], b2) if top_k > 1
                   else jnp.zeros(2 * B, jnp.int32)),
        "rs": _pick(seg["start"], b1),
        "re": _pick(seg["end"], b1),
        "mt": _pick(seg["matches"], b1),
        "ln": _pick(seg["length"], b1),
        "row": _pick(rows_c, b1),
        "col": _pick(cols_c, b1),
    }
    # fold strands (aligner.fold_strands with (row, col) instead of 'off')
    fwd = {n: v[:B] for n, v in cand.items()}
    rev = {n: v[B:] for n, v in cand.items()}
    use_rev = rev["score"] > fwd["score"]
    pick = lambda n: jnp.where(use_rev, rev[n], fwd[n])
    rs_raw = pick("rs")
    re_raw = pick("re")
    co = jnp.where(use_rev, coord_off[B:], coord_off[:B])
    out = [
        pick("score"),
        use_rev.astype(jnp.int32),
        rs_raw - co,
        re_raw - co,
        pick("mt"),
        pick("ln"),
        jnp.maximum(jnp.where(use_rev, rev["second"], fwd["second"]),
                    jnp.where(use_rev, fwd["score"], rev["score"])),
        pick("row"),
        pick("col") + rs_raw,                              # col of ref_start
        pick("col") + re_raw,                              # col of ref_end
    ]
    return jnp.stack([v.astype(jnp.int32) for v in out])


XL_FIELDS = ("score", "strand", "read_start", "read_end", "matches",
             "length", "second_score", "row", "col_start", "col_end")


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "halo", "R"))
def _xl_multi_extend_core(packed, tiles, rows_c, cols_c,
                          match: int, mismatch: int, halo: int, R: int):
    """All-hits extension: stacked (7, 2B, top_k) int32 candidates
    (score, start, end, matches, length, row, col)."""
    seg, flat, coord_off, B = _xl_windows_and_segments(
        packed, tiles, rows_c, cols_c, halo, R, match, mismatch)
    return jnp.stack([seg["score"], seg["start"], seg["end"], seg["matches"],
                      seg["length"], rows_c, cols_c]).astype(jnp.int32)


class GenomeAlignerXL:
    """Single-device genome aligner with a merged (stride-scaled) index.

    Drop-in for GenomeAligner past the int32 coordinate limit; requires
    ``cfg.index_stride >= 2`` (pos_div must fit int32: L/stride < 2^31).
    """

    def __init__(self, reference: Reference, cfg: Optional[AlignConfig] = None,
                 tile_c: int = TILE_C, halo: int = TILE_HALO,
                 verbose: bool = False, mesh=None):
        self.cfg = cfg or AlignConfig()
        self.reference = reference
        self.k = self.cfg.genome_kmer
        self.index_stride = max(1, getattr(self.cfg, "index_stride", 1))
        self.stride = self.cfg.resolved_query_stride()
        L = reference.total_length
        if L // self.index_stride >= 2 ** 31 - 2 ** 20:
            raise ValueError(
                f"L/index_stride = {L // self.index_stride} exceeds int32; "
                "raise AlignConfig.index_stride")
        if tile_c % self.index_stride:
            raise ValueError("tile_c must be a multiple of index_stride")
        self.C = tile_c
        self.halo = halo
        # Multi-chip operating point (VERDICT r4 #8): the strided hg38 index
        # FITS one chip, so across a mesh the index REPLICATES on every
        # device and the read batch shards over ALL mesh axes — per-device
        # gathers ∝ B/devices, zero collectives on the hot path (the same
        # layout the dp scaling model uses; ShardedGenomeAligner remains the
        # CAPACITY fallback for indexes too big per device).
        self.mesh = mesh
        self._rep_sh = self._data_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._rep_sh = NamedSharding(mesh, P())
            self._data_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        codes = np.asarray(reference.seq)
        import contextlib
        build_ctx = (jax.default_device(mesh.devices.flat[0])
                     if mesh is not None else contextlib.nullcontext())
        with build_ctx:
            self.table, self.pos_div = build_index_xl(
                codes, self.k, self.index_stride, verbose=verbose)
        if mesh is not None:
            self.table = jax.device_put(self.table, self._rep_sh)
            self.pos_div = jax.device_put(self.pos_div, self._rep_sh)
        jax.block_until_ready((self.table, self.pos_div))
        # COMPILATION is the memory hazard at hg38 scale, not execution: the
        # remote toolchain's compile of a program over a multi-GB operand
        # allocates operand-scale device scratch, so compiling with every
        # resident uploaded OOMs while running the same (cached) executable
        # succeeds.  Order of operations therefore: compile the SEED kernels
        # (pos_div resident, no tiles), upload tiles, compile the EXTEND
        # kernels (tiles resident, seed already built).  Batch shapes are
        # bucketed (``_xl_bucket``) so no novel shape compiles later at full
        # residency; the persistent compilation cache makes warmed shapes
        # free in subsequent processes.
        big = reference.total_length > 1_000_000_000
        if big:
            self._warm_seed()
        tiles_host = build_tiles_host(codes, tile_c, halo)
        self.tiles = (jnp.asarray(tiles_host) if mesh is None
                      else jax.device_put(tiles_host, self._rep_sh))
        jax.block_until_ready(self.tiles)
        if big:
            self._warm_extend()

    _WARM_BATCHES = (1024, 4096, 8192)

    def _warm_inputs(self, Bp: int):
        from anchored_fusion_tpu.ops.encode import pack_nibbles
        # warm the TRIMMED production width (_trim_width: 101bp reads in
        # the 128-lane default dispatch at 112); datasets whose reads
        # genuinely occupy >112 columns compile the 128 shape on first use
        R = self.cfg.max_read_len
        if R == 128:
            R = 112
        packed = pack_nibbles(np.full((Bp, R), PAD, np.int8))
        offs = read_kmer_offsets(R, self.k, self.stride)
        if self.mesh is not None:
            packed = jax.device_put(packed, self._data_sh)
            offs = jax.device_put(offs, self._rep_sh)
        else:
            offs = jnp.asarray(offs)
        return packed, offs, R

    def _warm_seed(self):
        cfg = self.cfg
        # (batch, top_k, max_hits) triples: best-hit chunks at
        # top_diagonals, all-hits (align_multi) chunks at its default
        # top_k=8; with two-pass seeding also the pass-1 operating point at
        # every batch bucket and the rescue point at the small buckets
        # (_xl_bucket pads rescue subsets to 1024/4096)
        H = cfg.max_hits_per_kmer
        combos = [(Bp, cfg.top_diagonals, H) for Bp in self._WARM_BATCHES]
        combos += [(Bp, 8, H) for Bp in (1024, 4096)]
        if getattr(cfg, "xl_two_pass", False):
            combos += [(Bp, cfg.xl_pass1_top_k, cfg.xl_pass1_hits)
                       for Bp in self._WARM_BATCHES]
            combos += [(Bp, cfg.xl_rescue_top_k, cfg.xl_rescue_hits)
                       for Bp in (1024, 4096)]
        for Bp, tk, mh in combos:
            packed, offs, R = self._warm_inputs(Bp)
            r, c = _xl_seed_core(
                packed, self.table, self.pos_div, offs, k=self.k, kb=self.k,
                stride_idx=self.index_stride, stride_q=self.stride,
                max_hits=mh, top_k=tk,
                T=-(-self.reference.total_length // self.C), C=self.C, R=R)
            jax.block_until_ready((r, c))

    def _warm_extend(self):
        cfg = self.cfg
        combos = [(Bp, cfg.top_diagonals) for Bp in self._WARM_BATCHES]
        if getattr(cfg, "xl_two_pass", False):
            combos += [(Bp, cfg.xl_pass1_top_k) for Bp in self._WARM_BATCHES]
            combos += [(Bp, cfg.xl_rescue_top_k) for Bp in (1024, 4096)]
        for Bp, tk in combos:
            packed, offs, R = self._warm_inputs(Bp)
            rows = jnp.full((2 * Bp, tk), self.tiles.shape[0] - 1, jnp.int32)
            cols = jnp.zeros((2 * Bp, tk), jnp.int32)
            out = _xl_extend_core(packed, self.tiles, rows, cols,
                                  top_k=tk,
                                  match=cfg.match_score,
                                  mismatch=cfg.mismatch_penalty,
                                  halo=self.halo, R=R)
            jax.block_until_ready(out)
        # the all-hits extension (negative mining / fine blocks) compiles
        # over the same tiles operand — warm its shapes too (top_k=8 is the
        # align_multi default the pipeline uses)
        for Bp in (1024, 4096):
            packed, offs, R = self._warm_inputs(Bp)
            rows = jnp.full((2 * Bp, 8), self.tiles.shape[0] - 1, jnp.int32)
            cols = jnp.zeros((2 * Bp, 8), jnp.int32)
            out = _xl_multi_extend_core(packed, self.tiles, rows, cols,
                                        match=cfg.match_score,
                                        mismatch=cfg.mismatch_penalty,
                                        halo=self.halo, R=R)
            jax.block_until_ready(out)

    @staticmethod
    def _trim_width(seqs: np.ndarray) -> np.ndarray:
        """Drop PAD-only tail columns down to the 112-lane bucket.

        Reads are left-aligned and standard Illumina reads are 101 bp in
        the 128-lane default width, so 2x(116-99) seed-gather offsets per
        read plus 12.5% of every extension window are spent on columns no
        read occupies.  Trimming to 112 (the only other warmed width) is
        bit-neutral: the dropped k-mer offsets were PAD-invalid for every
        read, and window/strand coordinate math is width-consistent.
        Widths other than 128 (candidate-join batches etc.) pass through.
        """
        if seqs.shape[1] != 128:
            return seqs
        occ = seqs[:, 112:] != PAD
        return seqs if occ.any() else seqs[:, :112]

    def _check_width(self, R: int):
        """Queries wider than the tile halo would get silently truncated /
        shifted extension windows (``start`` clips to [0, W-R]) — raise
        instead (ADVICE r4; mirrors aligner.py's ref_prepad width check)."""
        if R > self.halo:
            raise ValueError(
                f"query width {R} exceeds the tile halo {self.halo}; "
                "construct GenomeAlignerXL with halo >= the widest query "
                "batch (consensus batches reach 512)")

    def _align_raw(self, seqs: np.ndarray, top_k: int, max_hits: int,
                   chunk: int) -> np.ndarray:
        """Chunked seed+extend of ``seqs``: (10, B) host array, XL_FIELDS
        rows.  One pass at one (top_k, max_hits) operating point; the
        two-pass path calls this twice."""
        from anchored_fusion_tpu.ops.encode import pack_nibbles
        from anchored_fusion_tpu.align.aligner import GroupedPuller
        cfg = self.cfg
        B, R = seqs.shape
        offs_host = read_kmer_offsets(R, self.k, self.stride)
        offsets = (jnp.asarray(offs_host) if self.mesh is None
                   else jax.device_put(offs_host, self._rep_sh))
        puller = GroupedPuller(lambda a, n_r: a[:, :n_r])

        for lo in range(0, B, chunk):
            sub = seqs[lo:lo + chunk]
            n_real = sub.shape[0]
            if n_real < chunk:
                target = chunk if B > chunk else _xl_bucket(n_real, chunk)
                if target != n_real:
                    sub = np.concatenate(
                        [sub, np.full((target - n_real, R), PAD, np.int8)],
                        axis=0)
            packed = pack_nibbles(sub)
            if self.mesh is not None:
                # batch axis sharded over EVERY mesh axis; a bare asarray
                # would commit to the default device (the round-3 mp leak)
                packed = jax.device_put(packed, self._data_sh)
            rows_c, cols_c = _xl_seed_core(
                packed, self.table, self.pos_div, offsets,
                k=self.k, kb=self.k, stride_idx=self.index_stride,
                stride_q=self.stride, max_hits=max_hits, top_k=top_k,
                T=self.tiles.shape[0] - 1, C=self.C, R=R)
            puller.push(n_real, _xl_extend_core(
                packed, self.tiles, rows_c, cols_c, top_k=top_k,
                match=cfg.match_score, mismatch=cfg.mismatch_penalty,
                halo=self.halo, R=R))
        return np.concatenate(puller.finish(), axis=1)

    def align(self, seqs: np.ndarray, min_score: Optional[int] = None,
              min_identity: float = 0.0, min_seg_len: Optional[int] = None,
              top_k: Optional[int] = None, max_hits: Optional[int] = None,
              chunk: int = 8192) -> AlignmentResult:
        cfg = self.cfg
        min_score = min_score or cfg.min_align_score
        min_seg_len = min_seg_len or cfg.min_seg_len
        # an EXPLICIT top_k/max_hits pins that single-pass operating point;
        # two-pass seeding applies only to default-parameter calls (callers
        # asking for a specific H must get exactly that H)
        explicit = top_k is not None or max_hits is not None
        top_k = top_k or cfg.top_diagonals
        max_hits = max_hits or cfg.max_hits_per_kmer
        seqs = np.asarray(seqs, np.int8)
        if seqs.ndim == 1:
            seqs = seqs[None]
        if seqs.shape[1] % 2:
            seqs = np.concatenate(
                [seqs, np.full((seqs.shape[0], 1), PAD, np.int8)], axis=1)
        seqs = self._trim_width(seqs)
        B, R = seqs.shape
        self._check_width(R)
        if getattr(cfg, "xl_two_pass", False) and not explicit:
            # pass 1: cheap operating point for every read; the H-capped
            # bucket truncation and the reduced top-k only ever LOWER a
            # read's best score, so the confidence gate (near-perfect match
            # required) routes exactly the affected reads to the rescue pass
            arr = self._align_raw(seqs, cfg.xl_pass1_top_k,
                                  cfg.xl_pass1_hits, chunk)
            lens = (seqs != PAD).sum(axis=1)
            need = np.ceil(cfg.xl_confident_frac
                           * np.minimum(lens, R) * cfg.match_score)
            conf = (arr[0] >= need) & (arr[5] >= min_seg_len)
            idx = np.nonzero(~conf)[0]
            if len(idx):
                # rescue chunk capped at 4096: _xl_bucket would pad larger
                # subsets to 8192, a shape the rescue warms don't cover —
                # a novel compile at full index residency (the OOM hazard)
                arr2 = self._align_raw(seqs[idx],
                                       getattr(cfg, "xl_rescue_top_k", top_k),
                                       cfg.xl_rescue_hits, min(chunk, 4096))
                # keep the per-read BEST of the two passes: at extreme
                # bucket crowding the rescue's wider vote can spread past
                # its top-k and come back WORSE than pass 1's placement
                upd = arr2[0] > arr[0, idx]
                arr[:, idx[upd]] = arr2[:, upd]
        else:
            arr = self._align_raw(seqs, top_k, max_hits, chunk)
        f = {n: arr[i] for i, n in enumerate(XL_FIELDS)}
        base = f["row"].astype(np.int64) * self.C
        length = f["length"]
        matches = f["matches"]
        ident = matches / np.maximum(length, 1)
        mapped = ((f["score"] >= min_score) & (length >= min_seg_len)
                  & (ident >= min_identity))
        L = self.reference.total_length
        res = AlignmentResult(
            score=f["score"].astype(np.int32),
            strand=f["strand"].astype(np.int8),
            read_start=f["read_start"].astype(np.int32),
            read_end=f["read_end"].astype(np.int32),
            ref_start=np.clip(base + f["col_start"], 0, L - 1),
            ref_end=np.clip(base + f["col_end"], 0, L - 1),
            matches=matches.astype(np.int32),
            length=length.astype(np.int32),
            second_score=f["second_score"].astype(np.int32),
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
                    chunk: int = 4096) -> MultiHits:
        from anchored_fusion_tpu.ops.encode import pack_nibbles
        cfg = self.cfg
        max_hits = max_hits or cfg.max_hits_per_kmer
        seqs = np.asarray(seqs, np.int8)
        if seqs.ndim == 1:
            seqs = seqs[None]
        if seqs.shape[1] % 2:
            seqs = np.concatenate(
                [seqs, np.full((seqs.shape[0], 1), PAD, np.int8)], axis=1)
        seqs = self._trim_width(seqs)
        B, R = seqs.shape
        self._check_width(R)
        read_lens = (seqs != PAD).sum(axis=1).astype(np.int32)
        offs_host = read_kmer_offsets(R, self.k, self.stride)
        offsets = (jnp.asarray(offs_host) if self.mesh is None
                   else jax.device_put(offs_host, self._rep_sh))
        pending = []
        parts = []
        for lo in range(0, B, chunk):
            sub = seqs[lo:lo + chunk]
            n_real = sub.shape[0]
            if n_real < chunk:
                target = chunk if B > chunk else _xl_bucket(n_real, chunk)
                if target != n_real:
                    sub = np.concatenate(
                        [sub, np.full((target - n_real, R), PAD, np.int8)],
                        axis=0)
            packed = pack_nibbles(sub)
            if self.mesh is not None:
                packed = jax.device_put(packed, self._data_sh)
            rows_c, cols_c = _xl_seed_core(
                packed, self.table, self.pos_div, offsets,
                k=self.k, kb=self.k, stride_idx=self.index_stride,
                stride_q=self.stride, max_hits=max_hits, top_k=top_k,
                T=self.tiles.shape[0] - 1, C=self.C, R=R)
            pending.append((lo, n_real, sub, _xl_multi_extend_core(
                packed, self.tiles, rows_c, cols_c,
                match=cfg.match_score, mismatch=cfg.mismatch_penalty,
                halo=self.halo, R=R)))
            if len(pending) > 4:
                parts.append(self._collect_multi(
                    *pending.pop(0), top_k, min_score, min_identity,
                    min_seg_len, R))
        parts.extend(self._collect_multi(*p, top_k, min_score, min_identity,
                                         min_seg_len, R) for p in pending)
        return MultiHits(**{
            f.name: np.concatenate([getattr(p, f.name) for p in parts])
            for f in dataclasses.fields(MultiHits)})

    def _collect_multi(self, lo, n_real, sub, st, top_k, min_score,
                       min_identity, min_seg_len, R) -> MultiHits:
        arr = np.asarray(st)                      # (7, 2B, k)
        score, start, end, matches, length, row, col = arr
        Bc = arr.shape[1] // 2
        read_lens = (sub != PAD).sum(axis=1).astype(np.int32)
        lens = read_lens[None, :, None]
        sc = score.reshape(2, Bc, top_k)
        stt = start.reshape(2, Bc, top_k)
        enn = end.reshape(2, Bc, top_k)
        mtt = matches.reshape(2, Bc, top_k)
        lnn = length.reshape(2, Bc, top_k)
        rww = row.reshape(2, Bc, top_k).astype(np.int64)
        cll = col.reshape(2, Bc, top_k).astype(np.int64)
        ident = mtt / np.maximum(lnn, 1)
        keep = ((sc >= min_score) & (lnn >= min_seg_len)
                & (ident >= min_identity))
        gpos = rww * self.C + cll                 # global col of read pos 0
        # dedup identical (strand, diagonal) candidates (split votes at tile
        # boundaries and adjacent seeds converge to the same segment)
        srt = np.argsort(gpos, axis=2, kind="stable")
        g_s = np.take_along_axis(gpos, srt, 2)
        s_s = np.take_along_axis(stt, srt, 2)
        dup = np.zeros_like(keep)
        dup[:, :, 1:] = (g_s[:, :, 1:] == g_s[:, :, :-1]) & \
            (s_s[:, :, 1:] == s_s[:, :, :-1])
        undup = np.ones_like(keep)
        np.put_along_axis(undup, srt, ~dup, 2)
        keep &= undup
        s_idx, b_idx, _ = np.nonzero(keep)
        strand = s_idx.astype(np.int8)
        rs_raw, re_raw = stt[keep], enn[keep]
        ln = np.broadcast_to(lens, sc.shape)[keep]
        pad = np.where(strand == 1, R - ln, 0)
        rs = rs_raw - pad
        re = re_raw - pad
        q_start = np.where(strand == 0, rs, ln - 1 - re)
        q_end = np.where(strand == 0, re, ln - 1 - rs)
        L = self.reference.total_length
        mh = MultiHits(
            read_id=(b_idx + lo).astype(np.int32),
            strand=strand,
            score=sc[keep].astype(np.int32),
            matches=mtt[keep].astype(np.int32),
            length=lnn[keep].astype(np.int32),
            q_start=q_start.astype(np.int32),
            q_end=q_end.astype(np.int32),
            ref_start=np.clip(gpos[keep] + rs_raw, 0, L - 1),
            ref_end=np.clip(gpos[keep] + re_raw, 0, L - 1),
        )
        sel = b_idx < n_real
        return MultiHits(**{f.name: getattr(mh, f.name)[sel]
                            for f in dataclasses.fields(MultiHits)})
