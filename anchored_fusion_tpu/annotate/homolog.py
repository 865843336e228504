"""Homolog masking: genes the anchored transcript itself aligns into.

Re-design of ``Find_homo_genes`` (functions.py:336-373): the reference BLATs
the anchored transcript against the whole genome (-stepSize=3 -repMatch=10000
-minScore=50 -minIdentity=80), converts hits to BED and ``bedtools
intersect``s them with GTF gene rows.  Here the transcript is tiled into
overlapping windows, each window is aligned with the genome k-mer engine at
the homolog preset, and hit intervals are intersected with gene spans by a
numpy sweep — no temp PSL/BED files, no subprocesses.

The resulting gene set plays two roles downstream (exactly as in the
reference): evidence that a read end belongs to the anchor locus
(Find_blocks functions.py:416, Find_fine_block :639/:648) and exclusion of
homologous partners.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from anchored_fusion_tpu.config import HOMOLOG_PRESET
from anchored_fusion_tpu.ops.encode import PAD


def tile_sequence(codes: np.ndarray, width: int = 128, stride: int = 64) -> np.ndarray:
    """Overlapping fixed-width windows of a long sequence (PAD-padded tail)."""
    L = len(codes)
    starts = list(range(0, max(L - width, 0) + 1, stride))
    if not starts or starts[-1] + width < L:
        starts.append(max(L - width, 0))
    out = np.full((len(starts), width), PAD, dtype=np.int8)
    for i, s in enumerate(starts):
        chunk = codes[s:s + width]
        out[i, :len(chunk)] = chunk
    return out


def find_homolog_genes(
    genome_aligner,
    anchor_codes: np.ndarray,
    gene_rows: Sequence[Tuple[str, int, int, str, str, str]],
    genome,
    min_score: int = HOMOLOG_PRESET.min_score,
    min_identity: float = HOMOLOG_PRESET.min_identity,
) -> List[str]:
    """Gene ids whose span overlaps any strong anchor-transcript hit.

    Args:
      genome_aligner: a GenomeAligner over the genome.
      anchor_codes:   encoded anchored transcript.
      gene_rows:      (chrom, start, end, gene_id, gene_name, strand) GTF gene
                      rows (annotate.exon_index.parse_gtf_genes output).
      genome:         the io.fasta.Reference (for global->contig mapping).
    """
    tiles = tile_sequence(np.asarray(anchor_codes))
    hits = genome_aligner.align_multi(
        tiles, min_score=min_score, min_identity=min_identity, min_seg_len=30)
    if len(hits.score) == 0:
        return []
    # hit intervals in global coords -> merged per contig
    iv = np.stack([hits.ref_start, hits.ref_end], axis=1)
    iv = iv[np.argsort(iv[:, 0])]
    homo: List[str] = []
    seen = set()
    for chrom, gstart, gend, gene_id, gene_name, strand in gene_rows:
        lo = genome.to_global(chrom, int(gstart))
        hi = genome.to_global(chrom, int(gend))
        # any hit overlapping [lo, hi]?
        j = np.searchsorted(iv[:, 0], hi, side="right")
        if np.any(iv[:j, 1] >= lo):
            if gene_id not in seen:
                seen.add(gene_id)
                homo.append(gene_id)
    return homo
