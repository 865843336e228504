"""Fusion report writer.

Parity with ``Final_fusion`` (functions.py:1723-1793): emits the abridged and
full prediction TSVs with the reference's column layouts (with/without the
``Natural_score`` column), fusion naming (partner--anchor for SM,
anchor--partner for MS, :1728-1731), alternate-breakpoint listing
(``deal_pos2``, :1736-1745), read-imbalance and zero-read drops
(:1770-1772), and the two-threshold filter gate (:1786-1791).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from anchored_fusion_tpu.annotate.exon_index import ExonIndex
from anchored_fusion_tpu.call.candidates import Candidate
from anchored_fusion_tpu.config import CallConfig

ABRIDGED_COLS = ["Fusion_gene", "Anchored_gene_X", "X_clip_location",
                 "Partner_gene_Y", "Y_clip_location"]
FULL_EXTRA = ["Spanning_reads", "Breakpoint_reads", "Breakpoint_site_reads_1",
              "Breakpoint_site_reads_2", "Homo_genes"]


def _main_line(pos, gene_name: str, index: ExonIndex):
    tbp, chrom, obp = pos[0], pos[1], pos[2]
    other_gene, _ = index.find_exon(chrom, obp, obp + 1)
    if pos[9] == "SM":
        fusion = f"{other_gene[1]}--{gene_name}"
    else:
        fusion = f"{gene_name}--{other_gene[1]}"
    line = (f"{fusion}\t{gene_name}\t{gene_name}:{tbp}\t"
            f"{other_gene[1]}:{other_gene[0]}\t{chrom}:{obp}")
    return line, pos[10]


def _alt_line(type_: str, pos, gene_name: str, index: ExonIndex) -> str:
    tbp, chrom, obp = pos[0], pos[1], pos[2]
    other_gene, _ = index.find_exon(chrom, obp, obp + 1)
    if type_ == "SM":
        return f"{other_gene[1]}:{chrom}:{obp}--{gene_name}:{tbp}"
    return f"{gene_name}:{tbp}--{other_gene[1]}:{chrom}:{obp}"


def write_final_fusion(
    out_prefix: str,
    candidates: List[Candidate],
    gene_name: str,
    index: ExonIndex,
    scores: Sequence[float],
    cnt_max: int,
    filter_on: bool,
    cfg: Optional[CallConfig] = None,
) -> List[dict]:
    """Write ``<prefix>_predictions{_abridged}.txt``; returns emitted rows."""
    cfg = cfg or CallConfig()
    rows: List[dict] = []
    fa = open(out_prefix + "_predictions_abridged.txt", "w")
    fo = open(out_prefix + "_predictions.txt", "w")
    base = ABRIDGED_COLS + (["Natural_score"] if filter_on else []) + \
        ["Spanning_read_count", "Breakpoint_read_count"]
    fa.write("\t".join(base) + "\n")
    fo.write("\t".join(base + FULL_EXTRA) + "\n")
    seen = []
    for j, cand in enumerate(candidates):
        pos, max_id = cand.find_max_pos()
        line, _mid = _main_line(pos, gene_name, index)
        key = (pos[0], pos[1], pos[2], pos[3])
        if key in seen:
            continue
        seen.append(key)
        spanning = sorted(set(cand.spanning_reads))
        split = sorted(set(cand.split_reads))
        ns, nb = len(spanning), len(split)
        if ns * cfg.report_imbalance < nb or nb * cfg.report_imbalance < ns:
            continue
        if ns == 0 and nb == 0:
            continue
        score_col = f"\t{cand.score}" if filter_on else ""
        fa.write(f"{line}{score_col}\t{ns}\t{nb}\n")
        alts = [
            _alt_line(cand.type_, p, gene_name, index)
            for i, p in enumerate(cand.pos) if i != max_id
        ]
        full = (f"{line}{score_col}\t{ns}\t{nb}\t{';'.join(spanning)}\t"
                f"{';'.join(split)}\t{';'.join(alts)}\n")
        emit_full = True
        if filter_on:
            sc = scores[j] if j < len(scores) else 0.0
            reads = set(spanning + split)
            emit_full = sc > cfg.score_low and (
                len(reads) * cfg.report_imbalance > cnt_max or sc > cfg.score_high)
        if emit_full:
            fo.write(full)
            rows.append({
                "fusion": line.split("\t")[0],
                "anchor": gene_name,
                "anchor_breakpoint": pos[0],
                "partner_chrom": pos[1],
                "partner_breakpoint": pos[2],
                "strand": pos[3],
                "type": cand.type_,
                "spanning": ns,
                "split": nb,
                "score": cand.score,
            })
    fa.close()
    fo.close()
    return rows
