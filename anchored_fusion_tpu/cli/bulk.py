"""Bulk-sample CLI driver.

Flag and output-layout parity with ``Anchored_Fusion.py``: per target gene a
``<out>/<gene>_fusion/`` folder with ``work_dir`` / ``model_dir`` and
``<gene>_fusion_predictions{_abridged}.txt`` TSVs.  No bwa/samtools/blat/
bedtools — every stage is a device batch through the FusionPipeline.

Run:
  python -m anchored_fusion_tpu.cli.bulk --file_anchored_cds=... \
      --fastq1=... --fastq2=... --file_ref_seq=... --file_ref_ann=... \
      --out_folder=out [--not_filter_false_positive]
"""

from __future__ import annotations

import argparse
import os
import sys

from anchored_fusion_tpu.annotate.exon_index import ExonIndex, parse_gtf_genes
from anchored_fusion_tpu.config import PipelineConfig
from anchored_fusion_tpu.io.fasta import read_fasta
from anchored_fusion_tpu.io.fastq import read_fastq_pair
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str
from anchored_fusion_tpu.pipeline import FusionPipeline
from anchored_fusion_tpu.utils.log import StageLogger
from anchored_fusion_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Anchor Gene Fusion Detection (TPU-native)")
    common.add_common_args(p)
    p.add_argument("--fastq1", type=str, default="fastq_1.fastq")
    p.add_argument("--fastq2", type=str, default="fastq_2.fastq")
    return p


def main(argv=None) -> int:
    from anchored_fusion_tpu.utils.debug import maybe_enable_from_env
    maybe_enable_from_env()
    args = build_parser().parse_args(argv)
    common.enable_compilation_cache()
    multi = common.init_cluster(args)
    proc0 = True
    if multi:
        import jax
        proc0 = jax.process_index() == 0
    log = StageLogger("bulk")
    gene_names = common.resolve_gene_names(args)
    if not gene_names:
        print("no target gene names found")
        return 1
    os.makedirs(args.out_folder, exist_ok=True)
    model_out = os.path.join(args.out_folder, "model_dir")
    os.makedirs(model_out, exist_ok=True)

    with log.stage("load_inputs"):
        genome = read_fasta(args.file_ref_seq)
        index = ExonIndex.from_gtf(args.file_ref_ann)
        gene_rows = parse_gtf_genes(args.file_ref_ann)
        reads = read_fastq_pair(args.fastq1, args.fastq2)
        anchor_seqs = common.split_anchor_fasta(args.file_anchored_cds)
    log.set(pairs=reads.n_pairs, genes=len(gene_names),
            genome_bp=genome.total_length)

    cfg = PipelineConfig(
        align=common.align_config_for(args, genome.total_length),
        read_batch=args.read_batch,
        filter_false_positive=not args.not_filter_false_positive,
        train_filter_model=not args.not_train_filter_model,
    )
    with log.stage("build_indexes"):
        pipe = FusionPipeline(genome, index, gene_rows, cfg)

    filt = None
    if not args.not_filter_false_positive:
        with log.stage("filter_setup"):
            all_seqs = reads.seq.reshape(-1, reads.max_len)
            filt = common.setup_filter(args, pipe, index, all_seqs,
                                       gene_names, model_out)

    from anchored_fusion_tpu.utils.debug import gene_guard
    failures: list = []
    attempted = 0
    for gi, gene_name in enumerate(gene_names):
        out_name = gene_name + "_fusion"
        gene_dir = os.path.join(args.out_folder, out_name)
        out_prefix = os.path.join(gene_dir, out_name)
        if args.resume and os.path.exists(out_prefix + "_predictions.txt"):
            # job-level resume: completed genes are skipped (the reference's
            # file-existence memoization, Anchored_Fusion.py:181-203, applied
            # at the whole-gene level)
            print(f"[bulk] {gene_name}: resume hit, skipped")
            continue
        os.makedirs(os.path.join(gene_dir, "work_dir"), exist_ok=True)
        os.makedirs(os.path.join(gene_dir, "model_dir"), exist_ok=True)
        anchor_codes = encode_ascii(anchor_seqs.get(gi, ""))
        if anchor_codes.shape[0] == 0:
            print(f"warning: no anchored sequence for {gene_name}; skipped")
            continue
        score_fn = common.make_score_fn(filt, decode_to_str(anchor_codes),
                                        genome, index)
        attempted += 1
        # in a multi-host cluster every process computes the gene (stage 1
        # host-sharded + gathered inside call_gene); only process 0 writes
        # the prediction files — no shared-filesystem write races
        with log.stage(f"call:{gene_name}", items=reads.n_pairs * 2):
            with gene_guard(gene_name, failures, retries=args.gene_retries) as g:
                g.run(lambda: pipe.call_gene(
                    gene_name, anchor_codes, reads,
                    out_prefix=out_prefix if proc0 else None,
                    score_fn=score_fn))
            result = g.result
        if result is None:
            continue
        log.set(**{f"{gene_name}.{k}": v for k, v in result.counters.items()})
        for row in result.rows:
            print(f"{row['fusion']}\t{row['anchor_breakpoint']}\t"
                  f"{row['partner_chrom']}:{row['partner_breakpoint']}\t"
                  f"spanning={row['spanning']}\tsplit={row['split']}")
    if failures:
        log.set(failures=failures)
    if proc0:
        log.dump(os.path.join(args.out_folder, "run_stats.json"))
    # 2 = every ATTEMPTED gene failed (resume-skips don't mask a dead run),
    # 1 = some failed, 0 = clean
    if failures and len(failures) == attempted:
        return 2
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
