"""Single-cell CLI driver.

Parity with ``Anchored_Fusion_singlecell.py``: discovers per-cell FASTQ pairs
in ``--fastq_dir`` by suffix (``_1/_2`` with .fastq/.fastq.gz/.fq/.fq.gz,
:86-113), runs the per-gene pipeline per cell, then aggregates calls across
cells by breakpoint key into ``*_gene_cell_predictions{_abridged}.txt``
(:258-288).

Unlike the reference's serial per-cell loop, cells share one genome index and
one warm compiled alignment path — each cell is just another device batch.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, List, Tuple

from anchored_fusion_tpu.annotate.exon_index import ExonIndex, parse_gtf_genes
from anchored_fusion_tpu.config import PipelineConfig
from anchored_fusion_tpu.io.fasta import read_fasta
from anchored_fusion_tpu.io.fastq import read_fastq_pair
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str
from anchored_fusion_tpu.pipeline import FusionPipeline
from anchored_fusion_tpu.utils.log import StageLogger
from anchored_fusion_tpu.cli import common

_SUFFIXES = [(".fastq", ""), (".fastq.gz", ".gz"), (".fq", ""), (".fq.gz", ".gz")]


def discover_pairs(fastq_dir: str) -> List[Tuple[str, str, str]]:
    """(cell_name, mate1_file, mate2_file) per cell, sorted, suffix parity
    with Anchored_Fusion_singlecell.py:86-113."""
    files = sorted(os.listdir(fastq_dir))
    fset = set(files)
    out = []
    for f in files:
        for pat in (r"(\S+)_1\.fastq$", r"(\S+)_1\.fastq\.gz$",
                    r"(\S+)_1\.fq\.gz$", r"(\S+)_1\.fq$"):
            m = re.match(pat, f)
            if m:
                name = m.group(1)
                mate2 = f.replace("_1.", "_2.", 1)
                if mate2 in fset:
                    out.append((name, f, mate2))
                break
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Anchor Gene Fusion Detection, single-cell (TPU-native)")
    common.add_common_args(p)
    p.add_argument("--fastq_dir", type=str, required=True,
                   help="The fastq files to scan")
    return p


def main(argv=None) -> int:
    from anchored_fusion_tpu.utils.debug import maybe_enable_from_env
    maybe_enable_from_env()
    args = build_parser().parse_args(argv)
    common.enable_compilation_cache()
    multi = common.init_cluster(args)
    proc0 = True
    log = StageLogger("singlecell")
    gene_names = common.resolve_gene_names(args)
    pairs = discover_pairs(args.fastq_dir)
    all_cells = [name for name, _f1, _f2 in pairs]
    if multi:
        # per-host cell sharding (SURVEY §2.3 item 1): each host batches and
        # calls its own slice of the cell list, writing per-cell prediction
        # files (distinct paths — no cross-host write races); process 0
        # aggregates across ALL cells after the barrier below.  NB with the
        # filter ON each host mines negatives from its local cells only; for
        # bit-identical multi-host filter verdicts pass a pre-trained
        # --model_file or a shared --negative_samples file.
        import jax
        from anchored_fusion_tpu.parallel.distributed import host_shard
        proc0 = jax.process_index() == 0
        pairs = pairs[host_shard(len(pairs))]
    if not all_cells:
        print("no per-cell FASTQ pairs found")
        return 1
    os.makedirs(args.out_folder, exist_ok=True)
    model_out = os.path.join(args.out_folder, "model_dir")
    os.makedirs(model_out, exist_ok=True)

    with log.stage("load_inputs"):
        genome = read_fasta(args.file_ref_seq)
        index = ExonIndex.from_gtf(args.file_ref_ann)
        gene_rows = parse_gtf_genes(args.file_ref_ann)
        anchor_seqs = common.split_anchor_fasta(args.file_anchored_cds)
    cfg = PipelineConfig(
        align=common.align_config_for(args, genome.total_length),
        read_batch=args.read_batch,
        filter_false_positive=not args.not_filter_false_positive,
        train_filter_model=not args.not_train_filter_model,
    )
    with log.stage("build_indexes"):
        pipe = FusionPipeline(genome, index, gene_rows, cfg)

    cell_reads = {}
    for name, f1, f2 in pairs:
        cell_reads[name] = read_fastq_pair(
            os.path.join(args.fastq_dir, f1), os.path.join(args.fastq_dir, f2))

    filt = None
    if not args.not_filter_false_positive and cell_reads:
        with log.stage("filter_setup"):
            import numpy as np
            all_seqs = np.concatenate(
                [rb.seq.reshape(-1, rb.seq.shape[-1]) for rb in cell_reads.values()])
            filt = common.setup_filter(args, pipe, index, all_seqs,
                                       gene_names, model_out)

    for gi, gene_name in enumerate(gene_names):
        out_name = gene_name + "_fusion"
        gene_dir = os.path.join(args.out_folder, gene_name)
        work_dir = os.path.join(gene_dir, "work_dir")
        os.makedirs(work_dir, exist_ok=True)
        os.makedirs(os.path.join(gene_dir, "model_dir"), exist_ok=True)
        anchor_codes = encode_ascii(anchor_seqs.get(gi, ""))
        if anchor_codes.shape[0] == 0:
            continue
        score_fn = common.make_score_fn(filt, decode_to_str(anchor_codes),
                                        genome, index)
        per_cell_rows: Dict[str, List[dict]] = {}
        failures: List[dict] = []
        for cell in cell_reads:
            os.makedirs(os.path.join(work_dir, cell), exist_ok=True)
        total = sum(rb.n_pairs * 2 for rb in cell_reads.values())
        # ONE anchored-alignment batch over every cell (cells are a batch
        # dimension, SURVEY §7.2 step 7 — the reference loops cells serially);
        # per-cell host stages are failure-isolated so one bad cell cannot
        # sink the cohort.
        with log.stage(f"call:{gene_name}", items=total):
            results = pipe.call_gene_cells(
                gene_name, anchor_codes, cell_reads,
                out_prefix_for=lambda c: os.path.join(work_dir, c, out_name),
                score_fn=score_fn, failures=failures)
        per_cell_rows = {cell: r.rows for cell, r in results.items()}
        if failures:
            log.set(**{f"failures.{gene_name}": failures})

        # cross-cell aggregation (Anchored_Fusion_singlecell.py:258-288);
        # in a cluster: wait for every host's per-cell files, then process 0
        # aggregates over the FULL cell list via the shared filesystem
        if multi:
            from anchored_fusion_tpu.parallel.distributed import barrier
            barrier(f"sc_cells_done:{gene_name}")
        if not proc0:
            continue
        agg_path = os.path.join(gene_dir, out_name + "_gene_cell_predictions_abridged.txt")
        full_path = os.path.join(gene_dir, out_name + "_gene_cell_predictions.txt")
        faa = open(agg_path, "w")
        fao = open(full_path, "w")
        faa.write("Fusion_gene\tAnchored_gene_X\tX_clip_location\tPartner_gene_Y\t"
                  "Y_clip_location\tAll_Spanning_read_count\tAll_Breakpoint_read_count\t"
                  "Single_cells_count\tSingle_cells_name\n")
        fao.write("Cell_name\tFusion_gene\tAnchored_gene_X\tX_clip_location\t"
                  "Partner_gene_Y\tY_clip_location\tSpanning_read_count\t"
                  "Breakpoint_read_count\n")
        agg: Dict[str, list] = {}
        for cell in (all_cells if multi else per_cell_rows):
            pred = os.path.join(work_dir, cell, out_name + "_predictions.txt")
            if not os.path.exists(pred):
                continue
            lines = open(pred).readlines()
            for line in lines[1:]:
                arr = line.rstrip("\n").split("\t")
                key = "$".join(arr[:5])
                off = 6 if len(arr) > 7 and not args.not_filter_false_positive else 5
                ns, nb = int(arr[off]), int(arr[off + 1])
                if key not in agg:
                    agg[key] = [ns, nb, 1, [cell]]
                else:
                    agg[key][0] += ns
                    agg[key][1] += nb
                    agg[key][2] += 1
                    agg[key][3].append(cell)
                fao.write(cell + "\t" + "\t".join(arr[0:5] + [str(ns), str(nb)]) + "\n")
        for key, v in agg.items():
            faa.write("\t".join(key.split("$")) + f"\t{v[0]}\t{v[1]}\t{v[2]}\t"
                      + ";".join(v[3]) + "\n")
        faa.close()
        fao.close()
    if proc0:
        log.dump(os.path.join(args.out_folder, "run_stats.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
