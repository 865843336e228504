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
                repeat_frac: float = 0.1, seg_len: int = 10_000):
    """Random genome codes with ``repeat_frac`` of positions covered by
    copies of earlier segments (segmental duplications -> k-mer skew).

    Returns (codes, repeat_intervals sorted (R, 2)): reads sampled inside a
    duplicated interval legitimately map to either copy, so truth-position
    recall is only meaningful on reads outside them."""
    codes = rng.integers(0, 4, length, dtype=np.int8)
    n_rep = int(length * repeat_frac / seg_len)
    ivals = []
    for _ in range(n_rep):
        src = int(rng.integers(0, length - seg_len))
        dst = int(rng.integers(0, length - seg_len))
        codes[dst:dst + seg_len] = codes[src:src + seg_len]
        ivals += [(src, src + seg_len), (dst, dst + seg_len)]
    ivals = np.asarray(sorted(ivals), np.int64).reshape(-1, 2)
    return codes, ivals


def sample_reads(rng: np.random.Generator, codes: np.ndarray, n: int,
                 repeats: np.ndarray, read_len: int = 101,
                 error_rate: float = 0.005, pad_to: int = 128):
    """Reads sampled at known positions; half reverse-complemented.

    Returns (batch (n, pad_to) int8, truth_start, truth_end, clean mask)."""
    from anchored_fusion_tpu.ops.encode import revcomp
    L = len(codes)
    starts = rng.integers(0, L - read_len, n)
    batch = np.full((n, pad_to), 5, np.int8)
    for i, s in enumerate(starts):
        r = codes[s:s + read_len].copy()
        errs = np.nonzero(rng.random(read_len) < error_rate)[0]
        for e in errs:
            r[e] = (r[e] + int(rng.integers(1, 4))) % 4
        if i % 2:
            r = revcomp(r)
        batch[i, :read_len] = r
    ends = starts + read_len - 1
    clean = np.ones(n, bool)
    if len(repeats):
        # read overlaps a repeat iff some interval start <= read_end AND that
        # interval's end > read_start; conservative sweep over merged bounds
        idx = np.searchsorted(repeats[:, 0], ends, side="right")
        prev_end_cum = np.maximum.accumulate(repeats[:, 1])
        has_prev = idx > 0
        clean = ~(has_prev & (prev_end_cum[np.clip(idx - 1, 0, None)] > starts))
    return batch, starts.astype(np.int64), ends.astype(np.int64), clean


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
    ap.add_argument("--query-stride", type=int, default=0,
                    help="0 = auto (k//2 dense index, 1 sparse index)")
    ap.add_argument("--hits", type=str, default="16",
                    help="comma list of max_hits_per_kmer values to sweep")
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--repeat-frac", type=float, default=0.1)
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
    codes, repeats = make_genome(rng, L, args.repeat_frac)
    t_gen = time.time() - t0
    log(f"genome generated: {L/1e9:.2f} Gbp in {t_gen:.1f}s", quiet)
    ref = Reference(names=["chrS"], starts=np.zeros(1, np.int64),
                    lengths=np.asarray([L], np.int64), seq=codes)

    cfg = AlignConfig(index_stride=args.index_stride,
                      genome_query_stride=args.query_stride,
                      gapped_refine=not args.no_refine)
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
    log(f"reads sampled: {args.reads} ({int(clean.sum())} outside repeats)",
        quiet)
    sweep = {}
    akw = {"chunk": args.chunk} if (args.chunk and args.flat) else {}
    for h in [int(x) for x in args.hits.split(",")]:
        # full untimed pass: compiles every shape INCLUDING the refine
        # buckets later batches may select (first-compile is minutes here)
        for lo in range(0, args.reads, args.batch):
            ga.align(reads[lo:lo + args.batch], max_hits=h, **akw)
        t0 = time.time()
        parts = [ga.align(reads[lo:lo + args.batch], max_hits=h, **akw)
                 for lo in range(0, args.reads, args.batch)]
        dt = time.time() - t0
        ok = np.concatenate([
            recall_of(r, t_s[lo:lo + args.batch], t_e[lo:lo + args.batch])
            for lo, r in zip(range(0, args.reads, args.batch), parts)])
        sweep[f"H{h}"] = {
            "reads_per_s": round(args.reads / dt, 1),
            "recall": round(float(ok.mean()), 4),
            # truth-position recall only counts outside duplications (a
            # repeat read maps correctly to the OTHER copy)
            "recall_unique": round(float(ok[clean].mean()), 4),
        }
        log(f"H={h}: {sweep[f'H{h}']}", quiet)

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
        "n_reads": args.reads,
        "error_rate": args.error_rate,
        "sweep": sweep,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
