"""Full ten-stage fusion call at hg38 scale (VERDICT r4 directive #3).

The reference's operating mode is its whole pipeline against a whole genome
(`/root/reference/Anchored_Fusion.py:102` whole-genome bwa, `:123-229` the
per-gene stages); round 4 had measured only the genome-ALIGN stage at
3.1 Gbp.  This harness implants a BCR-ABL1-style fusion into a 3.1 Gbp
synthetic genome and drives ``FusionPipeline.call_gene`` — anchor align,
mate rescue, homolog masking, rescue, blocks, consensus, candidate
regions/validation/join and report — with the XL merged-index aligner, so
every stage executes against a genome past the int32 coordinate range.

Emits ONE JSON line: the emitted fusion row (asserted correct), per-stage
wall times, and the pipeline reads/s.

Run:  python -m anchored_fusion_tpu.bench.hg_e2e --gbp 3.1 --json-only
(defaults use index_stride 8 + two-pass XL seeding, the hg38 operating
point of docs/HG38_BENCH.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np

from anchored_fusion_tpu.bench.hg_scale import make_genome, log


def implant_genes(anchor_pos: int, partner_pos: int,
                  n_exons: int = 6, exon_len: int = 900,
                  intron_len: int = 600, chrom: str = "chrS"):
    """Two spliced genes carved out of the big genome at known loci.

    Pure coordinate bookkeeping: exons are slices of the (random) genome
    itself — nothing is written into the sequence — so transcripts match
    their loci exactly; coordinates are 1-based inclusive like a GTF.
    Returns (genes dict, gtf_dic, gene_rows) in the SynthGenome shapes the
    pipeline consumes."""
    from anchored_fusion_tpu.bench.simulate import SynthGene

    genes, gtf = {}, {chrom: []}
    for name, pos0 in (("ANCA", anchor_pos), ("PRTB", partner_pos)):
        exons = []
        p = pos0
        for _ in range(n_exons):
            exons.append((p + 1, p + exon_len))          # 1-based inclusive
            p += exon_len + intron_len
        gid = f"ENSG{pos0 % 10**6:06d}.{name}"
        genes[name] = SynthGene(name, chrom, "+", exons, gid)
        for s, e in exons:
            gtf[chrom].append([s, e, gid, name])
    rows = [(g.chrom, g.exons[0][0], g.exons[-1][1], g.gene_id, g.name,
             g.strand) for g in genes.values()]
    return genes, gtf, rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="hg38-scale ten-stage e2e")
    ap.add_argument("--gbp", type=float, default=3.1)
    ap.add_argument("--index-stride", type=int, default=8)
    ap.add_argument("--kmer", type=int, default=14,
                    help="genome k-mer (14 sizes the bucket table to ~1.4 "
                         "positions/bucket at hg38/stride-8 — the measured "
                         "operating point, docs/HG38_BENCH.json)")
    ap.add_argument("--two-pass", type=int, default=1)
    # ~5.4kb fusion transcript: 1500 pairs ≈ 56x junction coverage ≈ 55-60
    # junction-spanning mates — the bundled BCR-ABL1 sample's support scale
    ap.add_argument("--fusion-pairs", type=int, default=1500)
    ap.add_argument("--wild-pairs", type=int, default=4000)
    ap.add_argument("--repeat-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args(argv)
    quiet = args.json_only

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from anchored_fusion_tpu.annotate.exon_index import ExonIndex
    from anchored_fusion_tpu.bench.simulate import (fuse_transcripts,
                                                    simulate_pairs,
                                                    write_fastq_pair)
    from anchored_fusion_tpu.config import AlignConfig, PipelineConfig
    from anchored_fusion_tpu.io.fasta import Reference
    from anchored_fusion_tpu.io.fastq import read_fastq_pair
    from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str
    from anchored_fusion_tpu.pipeline import FusionPipeline

    L = int(args.gbp * 1e9)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    codes, repeats, _ = make_genome(rng, L, args.repeat_frac)
    t_gen = time.time() - t0
    log(f"genome generated: {L/1e9:.2f} Gbp in {t_gen:.1f}s", quiet)

    # gene loci far apart (the partner past int32 when the genome allows, so
    # every partner-side coordinate exercises the int64 host folds), nudged
    # off any implanted duplication so the loci stay unique sequence
    def clear_of_repeats(pos: int, span: int = 12_000) -> int:
        prev_end = (np.maximum.accumulate(repeats[:, 1])
                    if len(repeats) else None)
        while len(repeats):
            i = np.searchsorted(repeats[:, 0], pos + span, side="right")
            if i > 0 and prev_end[i - 1] > pos:
                # jump past the RUNNING-MAX end (an interval overlapping
                # [pos, pos+span) may not be the one at i-1 when interval
                # lengths vary — repeats[i-1, 1] could move pos backward
                # and loop forever)
                pos = int(prev_end[i - 1]) + 1000
            else:
                break
        return min(pos, L - span - 1000)
    anchor_pos = clear_of_repeats(int(L * 0.323) | 7)
    partner_pos = clear_of_repeats(int(L * 0.806) | 3)
    genes, gtf, rows = implant_genes(anchor_pos=anchor_pos,
                                     partner_pos=partner_pos)
    genome = Reference(names=["chrS"], starts=np.zeros(1, np.int64),
                       lengths=np.asarray([L], np.int64), seq=codes)
    txA = genes["ANCA"].transcript(genome)
    txB = genes["PRTB"].transcript(genome)
    # junction at the 3rd/4th exon boundary of each (a b3a2-style MS call)
    exon_len = genes["ANCA"].exons[0][1] - genes["ANCA"].exons[0][0] + 1
    break5 = 3 * exon_len                   # anchor-transcript breakpoint
    break3 = 3 * exon_len + 1
    fusion = fuse_transcripts(txA, txB, break5, break3)

    names_f, f1, f2 = simulate_pairs(rng, fusion, args.fusion_pairs,
                                     name_prefix="fus")
    names_w, w1, w2 = simulate_pairs(rng, txA, args.wild_pairs,
                                     name_prefix="wt")
    with tempfile.TemporaryDirectory() as td:
        write_fastq_pair(td + "/r1.fastq.gz", td + "/r2.fastq.gz",
                         names_f + names_w, f1 + w1, f2 + w2)
        reads = read_fastq_pair(td + "/r1.fastq.gz", td + "/r2.fastq.gz")
        log(f"simulated {reads.n_pairs} pairs "
            f"({args.fusion_pairs} fusion-spanning)", quiet)

        cfg = PipelineConfig(
            align=AlignConfig(index_stride=args.index_stride,
                              genome_kmer=args.kmer,
                              xl_two_pass=bool(args.two_pass)),
            filter_false_positive=False)
        t0 = time.time()
        pipe = FusionPipeline(genome, ExonIndex(gtf, inject_loci=False),
                              rows, cfg)
        t_init = time.time() - t0
        log(f"pipeline init (XL index build + warm): {t_init:.1f}s", quiet)

        anchor_codes = encode_ascii(txA)
        t0 = time.time()
        res = pipe.call_gene("ANCA", anchor_codes, reads,
                             out_prefix=td + "/e2e")    # warm/compile
        t_warm = time.time() - t0
        t0 = time.time()
        res = pipe.call_gene("ANCA", anchor_codes, reads,
                             out_prefix=td + "/e2e")
        t_call = time.time() - t0

    fus_rows = [r for r in res.rows if r["fusion"] == "ANCA--PRTB"]
    ok = bool(fus_rows) and any(
        abs(int(r["anchor_breakpoint"]) - break5) <= 5 for r in fus_rows)
    partner_ok = bool(fus_rows) and all(
        r["partner_chrom"] == "chrS" for r in fus_rows)
    out = {
        "genome_gbp": round(L / 1e9, 2),
        "index_stride": args.index_stride,
        "two_pass": bool(args.two_pass),
        "n_pairs": int(reads.n_pairs),
        "fusion_pairs": args.fusion_pairs,
        "expected_breakpoint": break5,
        "emitted": [{k: (int(v) if isinstance(v, (int, np.integer)) else v)
                     for k, v in r.items() if k in
                     ("fusion", "type", "anchor_breakpoint", "partner_chrom",
                      "partner_breakpoint", "split", "spanning")}
                    for r in res.rows],
        "correct_call": ok,
        "partner_chrom_ok": partner_ok,
        "init_s": round(t_init, 1),
        "first_call_s": round(t_warm, 1),
        "warm_call_s": round(t_call, 2),
        "pipeline_reads_per_s": round(res.counters["reads"] / t_call, 1),
        "stage_walls_s": {k[5:-2]: v for k, v in res.counters.items()
                          if k.startswith("time.")},
        "counters": {k: v for k, v in res.counters.items()
                     if not k.startswith("time.")},
    }
    print(json.dumps(out))
    if not (ok and partner_ok):
        log("FUSION CALL INCORRECT", False)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
