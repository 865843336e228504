"""hg38-scale genome-stage benchmark + recall characterization.

The reference's default operating point is the whole human genome: bwa
indexes and aligns against hg38 for mate rescue, multi-mapper rescue, and
negative mining (Anchored_Fusion.py:102/:178, functions.py:716).  hg38
itself is not in this environment, so this harness measures the same
regime on a synthetic genome of the requested size (with implanted
segmental duplications to stress seed-hit skew the way real repeats do):

  * sharded k-mer index build wall time (host, per-phase) and bytes
    (host arrays == device residency per shard),
  * device placement (transfer) time,
  * genome-stage alignment throughput (reads/s) in production batches,
  * recall vs a known truth set, swept over ``max_hits_per_kmer`` (H) and
    any requested ``index_stride`` — the data VERDICT r2 asked for before
    adopting a faster H or a sparse index.

Run (real chip):
  python -m anchored_fusion_tpu.bench.hg_scale --gbp 1.0 --shards 4 \
      --index-stride 4 --hits 8,16,32 --reads 16384
Emits one JSON line; drop ``--json-only`` for progress logs on stderr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def log(msg: str, quiet: bool):
    if not quiet:
        print(f"[hg_scale] {msg}", file=sys.stderr, flush=True)


def make_genome(rng: np.random.Generator, length: int,
                repeat_frac: float = 0.1, seg_len: int = 10_000,
                family_copies: int = 0, family_count: int = 50,
                family_len: int = 1_000, family_div: float = 0.03):
    """Random genome codes with ``repeat_frac`` of positions covered by
    copies of earlier segments (segmental duplications -> k-mer skew).

    Returns (codes, repeat_intervals sorted (R, 2)): reads sampled inside a
    duplicated interval legitimately map to either copy, so truth-position
    recall is only meaningful on reads outside them.

    ``family_copies`` > 0 additionally implants ``family_count`` repeat
    FAMILIES of ``family_copies`` copies each (copy number 8-32 stresses the
    H-capped seed buckets the way Alu/LINE families and multi-copy
    segmental duplications do — VERDICT r4 weak #5).  Each copy diverges by
    ``family_div`` point mutations: diverged copies are uniquely placeable,
    so family reads COUNT toward truth-position recall while their k-mer
    buckets hold ~family_copies entries — the adversarial case for
    ``max_hits_per_kmer``.  Zero-divergence copies would be legitimate
    multi-mappers and are marked as repeat intervals instead."""
    codes = rng.integers(0, 4, length, dtype=np.int8)
    n_rep = int(length * repeat_frac / seg_len)
    ivals = []
    for _ in range(n_rep):
        src = int(rng.integers(0, length - seg_len))
        dst = int(rng.integers(0, length - seg_len))
        codes[dst:dst + seg_len] = codes[src:src + seg_len]
        ivals += [(src, src + seg_len), (dst, dst + seg_len)]
    fam_ivals = []
    for _ in range(family_count if family_copies else 0):
        seg = rng.integers(0, 4, family_len, dtype=np.int8)
        for _ in range(family_copies):
            dst = int(rng.integers(0, length - family_len))
            c = seg.copy()
            if family_div > 0:
                m = np.nonzero(rng.random(family_len) < family_div)[0]
                c[m] = (c[m] + rng.integers(1, 4, len(m))) % 4
                fam_ivals.append((dst, dst + family_len))
            else:
                ivals.append((dst, dst + family_len))
            codes[dst:dst + family_len] = c
    ivals = np.asarray(sorted(ivals), np.int64).reshape(-1, 2)
    fam = np.asarray(sorted(fam_ivals), np.int64).reshape(-1, 2)
    return codes, ivals, fam


def _reads_at(rng: np.random.Generator, codes: np.ndarray,
              starts: np.ndarray, read_len: int, error_rate: float,
              pad_to: int) -> np.ndarray:
    from anchored_fusion_tpu.ops.encode import revcomp
    batch = np.full((len(starts), pad_to), 5, np.int8)
    for i, s in enumerate(starts):
        r = codes[s:s + read_len].copy()
        errs = np.nonzero(rng.random(read_len) < error_rate)[0]
        for e in errs:
            r[e] = (r[e] + int(rng.integers(1, 4))) % 4
        if i % 2:
            r = revcomp(r)
        batch[i, :read_len] = r
    return batch


def sample_reads(rng: np.random.Generator, codes: np.ndarray, n: int,
                 repeats: np.ndarray, read_len: int = 101,
                 error_rate: float = 0.005, pad_to: int = 128,
                 intervals: np.ndarray = None):
    """Reads sampled at known positions; half reverse-complemented.

    ``intervals`` restricts sampling to those (start, end) spans (targeted
    repeat-family reads); default is genome-wide.  Returns (batch (n,
    pad_to) int8, truth_start, truth_end, clean mask)."""
    L = len(codes)
    if intervals is None:
        starts = rng.integers(0, L - read_len, n)
    else:
        picks = intervals[rng.integers(0, len(intervals), n)]
        span = np.maximum(picks[:, 1] - picks[:, 0] - read_len, 1)
        starts = picks[:, 0] + (rng.random(n) * span).astype(np.int64)
        starts = np.minimum(starts, L - read_len)
    batch = _reads_at(rng, codes, starts, read_len, error_rate, pad_to)
    ends = starts + read_len - 1
    clean = ~overlaps_any(repeats, starts, ends)
    return batch, starts.astype(np.int64), ends.astype(np.int64), clean


def overlaps_any(intervals: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray) -> np.ndarray:
    """Per-read bool: overlaps some (start, end) interval.  Conservative
    sweep over merged bounds (interval start <= read_end AND that
    interval's running max end > read_start)."""
    if not len(intervals):
        return np.zeros(len(starts), bool)
    idx = np.searchsorted(intervals[:, 0], ends, side="right")
    prev_end_cum = np.maximum.accumulate(intervals[:, 1])
    has_prev = idx > 0
    return has_prev & (prev_end_cum[np.clip(idx - 1, 0, None)] > starts)


def profile_xl_stages(ga, reads, batch: int, top_k: int, max_hits: int):
    """Seed vs extend wall split for the XL path (forced ``np.asarray``
    syncs — ``block_until_ready`` returns early on this runtime).  The
    residual of the end-to-end align() time over (seed+extend) is the
    refine post-pass + host fold + result pulls."""
    import jax.numpy as jnp
    from anchored_fusion_tpu.ops.encode import pack_nibbles
    from anchored_fusion_tpu.align.genome_xl import (_xl_seed_core,
                                                     _xl_extend_core)
    from anchored_fusion_tpu.index.kmer import read_kmer_offsets
    from anchored_fusion_tpu.align.genome_xl import _xl_bucket
    from anchored_fusion_tpu.ops.encode import PAD
    reads = ga._trim_width(np.asarray(reads, np.int8))
    R = reads.shape[1]
    offsets = jnp.asarray(read_kmer_offsets(R, ga.k, ga.stride))
    t_seed = t_ext = 0.0
    for lo in range(0, len(reads), batch):
        sub = reads[lo:lo + batch]
        if sub.shape[0] < batch:
            # pad partial batches to a warmed bucket like production
            # (_align_raw): a novel shape here would COMPILE at full index
            # residency and bill the compile to t_seed
            tgt = _xl_bucket(sub.shape[0], batch)
            sub = np.concatenate(
                [sub, np.full((tgt - sub.shape[0], R), PAD, np.int8)])
        packed = pack_nibbles(sub)
        t0 = time.time()
        r, c = _xl_seed_core(
            packed, ga.table, ga.pos_div, offsets, k=ga.k, kb=ga.k,
            stride_idx=ga.index_stride, stride_q=ga.stride,
            max_hits=max_hits, top_k=top_k,
            T=ga.tiles.shape[0] - 1, C=ga.C, R=R)
        np.asarray((r, c))
        t_seed += time.time() - t0
        t0 = time.time()
        np.asarray(_xl_extend_core(
            packed, ga.tiles, r, c, top_k=top_k, match=ga.cfg.match_score,
            mismatch=ga.cfg.mismatch_penalty, halo=ga.halo, R=R))
        t_ext += time.time() - t0
    return t_seed, t_ext


def recall_of(res, t_start, t_end, tol: int = 30) -> np.ndarray:
    """Per-read bool: best hit overlaps the truth span (±tol)."""
    return (np.asarray(res.mapped)
            & (np.asarray(res.ref_start) <= t_end + tol)
            & (np.asarray(res.ref_end) >= t_start - tol))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="hg38-scale genome-stage bench")
    ap.add_argument("--gbp", type=float, default=1.0,
                    help="genome size in Gbp (hg38 is ~3.1)")
    ap.add_argument("--shards", type=int, default=0,
                    help="index shards (0 = the pipeline's auto sizing)")
    ap.add_argument("--index-stride", type=int, default=1)
    ap.add_argument("--kmer", type=int, default=0,
                    help="genome k-mer size (0 = AlignConfig default). "
                         "At hg38/stride-8 the k=13 table holds 5.8 "
                         "positions per bucket, so the H cap truncates most "
                         "buckets; k=14 (1.07GB table) drops the load to "
                         "1.45, making small H near-lossless")
    ap.add_argument("--query-stride", type=int, default=0,
                    help="0 = auto (k//2 dense index, 1 sparse index)")
    ap.add_argument("--hits", type=str, default="16",
                    help="comma list of max_hits_per_kmer values to sweep")
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--repeat-frac", type=float, default=0.1)
    ap.add_argument("--family-copies", type=int, default=0,
                    help="implant repeat families at this copy number "
                         "(0 = off; 8/16/32 stress the H-capped buckets)")
    ap.add_argument("--family-count", type=int, default=50)
    ap.add_argument("--family-len", type=int, default=1000)
    ap.add_argument("--family-div", type=float, default=0.03,
                    help="per-copy divergence (>0: copies uniquely "
                         "placeable, reads count toward recall)")
    ap.add_argument("--family-reads", type=int, default=2048,
                    help="extra reads sampled INSIDE family copies")
    ap.add_argument("--error-rate", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-refine", action="store_true",
                    help="disable the gapped-refine post-pass")
    ap.add_argument("--chunk", type=int, default=0,
                    help="flat-path dispatch chunk (0 = aligner default)")
    ap.add_argument("--device-build", action="store_true",
                    help="build the index on the chip (auto past 200Mbp)")
    ap.add_argument("--flat", action="store_true",
                    help="use the flat single-index GenomeAligner "
                         "(genome must fit int32 coords, < 2.1Gbp)")
    ap.add_argument("--xl", action="store_true",
                    help="use the merged-index GenomeAlignerXL (single "
                         "device, any size; requires index-stride >= 2 "
                         "past 2.1Gbp)")
    ap.add_argument("--two-pass", action="store_true",
                    help="XL two-pass seeding (pass-1 cheap point + "
                         "confidence-gated rescue; AlignConfig.xl_two_pass)")
    ap.add_argument("--pass1-hits", type=int, default=4)
    ap.add_argument("--pass1-topk", type=int, default=4)
    ap.add_argument("--rescue-hits", type=int, default=16)
    ap.add_argument("--rescue-topk", type=int, default=8)
    ap.add_argument("--confident-frac", type=float, default=0.90)
    ap.add_argument("--profile-stages", action="store_true",
                    help="XL path: report seed/extend wall split per sweep "
                         "point (forced syncs; the residual vs align() is "
                         "refine + host fold + pulls)")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args(argv)
    quiet = args.json_only

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from anchored_fusion_tpu.config import AlignConfig
    from anchored_fusion_tpu.io.fasta import Reference
    from anchored_fusion_tpu.parallel.sharded_genome import (
        ShardedGenomeAligner, _build_shard_arrays)

    L = int(args.gbp * 1e9)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    codes, repeats, fam_ivals = make_genome(
        rng, L, args.repeat_frac, family_copies=args.family_copies,
        family_count=args.family_count, family_len=args.family_len,
        family_div=args.family_div)
    t_gen = time.time() - t0
    log(f"genome generated: {L/1e9:.2f} Gbp in {t_gen:.1f}s"
        + (f" ({len(fam_ivals)} diverged family copies)"
           if len(fam_ivals) else ""), quiet)
    ref = Reference(names=["chrS"], starts=np.zeros(1, np.int64),
                    lengths=np.asarray([L], np.int64), seq=codes)

    kmer_kw = {"genome_kmer": args.kmer} if args.kmer else {}
    cfg = AlignConfig(index_stride=args.index_stride,
                      genome_query_stride=args.query_stride,
                      gapped_refine=not args.no_refine,
                      **kmer_kw,
                      xl_two_pass=args.two_pass,
                      xl_pass1_hits=args.pass1_hits,
                      xl_pass1_top_k=args.pass1_topk,
                      xl_rescue_hits=args.rescue_hits,
                      xl_rescue_top_k=args.rescue_topk,
                      xl_confident_frac=args.confident_frac)
    int32_safe = 2**31 - 2**20
    n_shards = args.shards or max(2, -(-L // (int32_safe // 2)))

    device_build = args.device_build or L > 200_000_000
    if args.xl:
        from anchored_fusion_tpu.align.genome_xl import GenomeAlignerXL
        t0 = time.time()
        ga = GenomeAlignerXL(ref, cfg=cfg, verbose=not quiet)
        jax.block_until_ready((ga.table, ga.pos_div, ga.tiles))
        t_build = time.time() - t0
        t_place = 0.0
        kb = ga.k
        n_shards = 1
        dev_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                        for a in (ga.table, ga.pos_div, ga.tiles))
        log(f"XL merged index built: kb={kb}, {dev_bytes/2**30:.2f} GiB in "
            f"{t_build:.1f}s", quiet)
    elif args.flat:
        from anchored_fusion_tpu.align.genome import GenomeAligner
        t0 = time.time()
        ga = GenomeAligner(ref, cfg=cfg, device_build=device_build)
        jax.block_until_ready((ga.index.table, ga.index.pos_sorted, ga.codes))
        t_build = time.time() - t0
        t_place = 0.0
        kb = ga.index.kb
        n_shards = 1
        dev_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                        for a in (ga.index.table, ga.index.keys_sorted,
                                  ga.index.pos_sorted, ga.codes))
        log(f"flat index built: kb={kb}, {dev_bytes/2**30:.2f} GiB in "
            f"{t_build:.1f}s", quiet)
    elif device_build:
        t0 = time.time()
        ga = ShardedGenomeAligner(ref, n_shards=n_shards, cfg=cfg,
                                  device_build=True)
        jax.block_until_ready((ga.keys, ga.pos, ga.tbl, ga.seq))
        t_build = time.time() - t0
        t_place = 0.0  # built in place on device (transfer = codes only)
        kb = ga.kb
        dev_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                        for a in jax.tree.leaves(
                            (ga.keys, ga.pos, ga.tbl, ga.seq)))
        log(f"device index built: {n_shards} shards, kb={kb}, "
            f"{dev_bytes/2**30:.2f} GiB HBM in {t_build:.1f}s", quiet)
    else:
        t0 = time.time()
        prebuilt = _build_shard_arrays(codes, n_shards, cfg.genome_kmer,
                                       512, stride=args.index_stride)
        t_build = time.time() - t0
        keys, pos, tbl, seq, offs, kb = prebuilt
        dev_bytes = keys.nbytes + pos.nbytes + tbl.nbytes + seq.nbytes
        log(f"host index built: {n_shards} shards, kb={kb}, "
            f"{dev_bytes/2**30:.2f} GiB in {t_build:.1f}s", quiet)
        t0 = time.time()
        ga = ShardedGenomeAligner(ref, n_shards=n_shards, cfg=cfg,
                                  prebuilt=prebuilt)
        # force placement now so transfer time is not billed to alignment
        jax.block_until_ready((ga.keys, ga.pos, ga.tbl, ga.seq))
        t_place = time.time() - t0
        log(f"device placement: {t_place:.1f}s", quiet)

    reads, t_s, t_e, clean = sample_reads(rng, codes, args.reads, repeats,
                                          error_rate=args.error_rate)
    # genome-wide reads that happen to fall in a diverged family copy face
    # the same crowded-bucket case as the targeted family reads — count
    # them as family, not as "unique"
    fam_mask = overlaps_any(fam_ivals, t_s, t_e)
    if len(fam_ivals) and args.family_reads:
        # targeted reads INSIDE diverged family copies: they are uniquely
        # placeable (divergence > 0) but their k-mer buckets are crowded to
        # ~family_copies entries — the adversarial case for the H cap
        fr, fs, fe, fc = sample_reads(rng, codes, args.family_reads, repeats,
                                      error_rate=args.error_rate,
                                      intervals=fam_ivals)
        reads = np.concatenate([reads, fr])
        t_s = np.concatenate([t_s, fs])
        t_e = np.concatenate([t_e, fe])
        clean = np.concatenate([clean, fc])
        fam_mask = np.concatenate([fam_mask, np.ones(args.family_reads, bool)])
    n_total = reads.shape[0]
    log(f"reads sampled: {n_total} ({int(clean.sum())} outside repeats, "
        f"{int(fam_mask.sum())} in diverged families)", quiet)
    sweep = {}
    akw = {"chunk": args.chunk} if (args.chunk and args.flat) else {}
    for h in [int(x) for x in args.hits.split(",")]:
        # two-pass mode uses the configured pass-1/rescue operating points:
        # an explicit max_hits would pin a single-pass point instead
        # (GenomeAlignerXL.align: explicit args win over xl_two_pass)
        if not (args.two_pass and args.xl):
            akw["max_hits"] = h
        # full untimed pass: compiles every shape INCLUDING the refine
        # buckets later batches may select (first-compile is minutes here)
        for lo in range(0, n_total, args.batch):
            ga.align(reads[lo:lo + args.batch], **akw)
        t0 = time.time()
        parts = [ga.align(reads[lo:lo + args.batch], **akw)
                 for lo in range(0, n_total, args.batch)]
        dt = time.time() - t0
        ok = np.concatenate([
            recall_of(r, t_s[lo:lo + args.batch], t_e[lo:lo + args.batch])
            for lo, r in zip(range(0, n_total, args.batch), parts)])
        key = (f"2P_h{args.pass1_hits}k{args.pass1_topk}_r{args.rescue_hits}t{args.rescue_topk}"
               if args.two_pass else f"H{h}")
        sweep[key] = {
            "reads_per_s": round(n_total / dt, 1),
            "recall": round(float(ok.mean()), 4),
            # truth-position recall only counts outside duplications (a
            # repeat read maps correctly to the OTHER copy)
            "recall_unique": round(float(ok[clean & ~fam_mask].mean()), 4),
        }
        if fam_mask.any():
            sweep[key]["recall_family"] = round(float(ok[fam_mask].mean()), 4)
        if args.profile_stages and args.xl:
            ts, te = profile_xl_stages(ga, reads, args.batch,
                                       args.pass1_topk if args.two_pass
                                       else ga.cfg.top_diagonals,
                                       args.pass1_hits if args.two_pass
                                       else h)
            sweep[key]["profile"] = {
                "seed_s": round(ts, 3), "extend_s": round(te, 3),
                "align_s": round(dt, 3),
                "residual_s": round(dt - ts - te, 3)}
        log(f"{key}: {sweep[key]}", quiet)

    print(json.dumps({
        "genome_gbp": round(L / 1e9, 3),
        "repeat_frac": args.repeat_frac,
        "n_shards": n_shards,
        "index_stride": args.index_stride,
        "query_stride": ga.stride,
        "kmer": cfg.genome_kmer,
        "bucket_bases": kb,
        "device_build": device_build,
        "index_build_s": round(t_build, 1),
        "device_place_s": round(t_place, 1),
        "index_gib": round(dev_bytes / 2**30, 2),
        "per_shard_gib": round(dev_bytes / 2**30 / n_shards, 2),
        "gapped_refine": not args.no_refine,
        "two_pass": args.two_pass,
        "family_copies": args.family_copies,
        "family_div": args.family_div if args.family_copies else None,
        "n_reads": int(n_total),
        "error_rate": args.error_rate,
        "sweep": sweep,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
