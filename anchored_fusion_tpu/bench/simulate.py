"""Synthetic genomes and wgsim-style paired-end read simulation.

Covers the reference's benchmark generator (utils/simulate_reads.py: wgsim
``-d 200 -1 101 -2 101`` over fusion transcripts at coverages 2x-128x) and
additionally builds fully synthetic genome+GTF fixtures so the genome-side
pipeline (blocks, candidate validation, homolog masking, negative mining) can
be tested hermetically — the real hg38 is not available in this environment.
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from anchored_fusion_tpu.io.fasta import Reference, reference_from_dict
from anchored_fusion_tpu.ops.encode import encode_ascii, decode_to_str, revcomp

_BASES = np.array(list("ACGT"))


def random_seq(rng: np.random.Generator, n: int) -> str:
    return "".join(_BASES[rng.integers(0, 4, n)])


@dataclasses.dataclass
class SynthGene:
    name: str
    chrom: str
    strand: str
    exons: List[Tuple[int, int]]  # 1-based inclusive, genomic order
    # gene_id must look like a real Ensembl id (ENSG<digits>...) so the GTF
    # gene-row regex of the homolog mask matches it (functions.py:358 parity)
    gene_id: str = ""

    def transcript(self, genome: Reference) -> str:
        parts = [genome.fetch_str(self.chrom, s, e) for s, e in self.exons]
        tx = "".join(parts)
        if self.strand == "-":
            tx = decode_to_str(revcomp(encode_ascii(tx)))
        return tx


@dataclasses.dataclass
class SynthGenome:
    genome: Reference
    genes: Dict[str, SynthGene]
    gtf_dic: Dict[str, List[List]]  # ExonIndex input format

    def gene_rows(self):
        """(chrom, start, end, gene_id, gene_name, strand) rows for homolog mask."""
        rows = []
        for g in self.genes.values():
            rows.append((g.chrom, g.exons[0][0], g.exons[-1][1],
                         g.gene_id, g.name, g.strand))
        return rows


def write_gtf(sg: "SynthGenome", path: str):
    """Emit the synthetic annotation as a GTF the CLI/ExonIndex can parse."""
    with open(path, "w") as fh:
        fh.write("##synthetic annotation\n")
        for g in sg.genes.values():
            gid = g.gene_id
            # GENCODE-style attribute order: the reference's gene-row regex
            # (functions.py:358) requires at least one attribute between
            # gene_id and gene_name.
            attrs = (f'gene_id "{gid}"; transcript_id "{gid}.t1"; '
                     f'gene_type "protein_coding"; gene_name "{g.name}"; '
                     f'transcript_type "protein_coding";')
            fh.write(f"{g.chrom}\tsynth\tgene\t{g.exons[0][0]}\t{g.exons[-1][1]}"
                     f"\t.\t{g.strand}\t.\t{attrs}\n")
            for s, e in g.exons:
                fh.write(f"{g.chrom}\tsynth\texon\t{s}\t{e}\t.\t{g.strand}\t.\t{attrs}\n")


def write_fasta(name_to_seq, path: str):
    with open(path, "w") as fh:
        for name, seq in name_to_seq.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                fh.write(seq[i:i + 70] + "\n")


def make_synthetic_genome(
    rng: np.random.Generator,
    n_genes: int = 6,
    exons_per_gene: Tuple[int, int] = (3, 6),
    exon_len: Tuple[int, int] = (150, 400),
    intron_len: Tuple[int, int] = (200, 800),
    intergenic: Tuple[int, int] = (500, 1500),
    chrom: str = "chr1",
    gene_prefix: str = "GENE",
    namer=None,
) -> SynthGenome:
    """A single-chromosome genome with spliced genes and a matching exon dict.

    ``namer(gi) -> str`` overrides the default ``{gene_prefix}{gi}`` names.
    Cohorts feeding the negative miner need it: `Inspect_name` parity
    (models/negative.py:_inspect_name, reference functions.py) rejects any
    pair sharing a 3-character name prefix as same-family paralogs, so a
    single shared prefix silently rejects EVERY mined pair."""
    parts: List[str] = []
    pos = 1
    genes: Dict[str, SynthGene] = {}
    gtf: Dict[str, List[List]] = {chrom: []}
    for gi in range(n_genes):
        gap = int(rng.integers(*intergenic))
        parts.append(random_seq(rng, gap))
        pos += gap
        name = namer(gi) if namer is not None else f"{gene_prefix}{gi}"
        n_ex = int(rng.integers(exons_per_gene[0], exons_per_gene[1] + 1))
        exons = []
        for ei in range(n_ex):
            el = int(rng.integers(*exon_len))
            parts.append(random_seq(rng, el))
            exons.append((pos, pos + el - 1))
            pos += el
            if ei != n_ex - 1:
                il = int(rng.integers(*intron_len))
                parts.append(random_seq(rng, il))
                pos += il
        strand = "+" if rng.integers(0, 2) == 0 else "-"
        gene_id = f"ENSG{gi:06d}.{name}"
        genes[name] = SynthGene(name, chrom, strand, exons, gene_id)
        for s, e in exons:
            gtf[chrom].append([s, e, gene_id, name])
    parts.append(random_seq(rng, 500))
    genome = reference_from_dict({chrom: "".join(parts)})
    return SynthGenome(genome, genes, gtf)


def fuse_transcripts(tx5: str, tx3: str, break5: int, break3: int) -> str:
    """Fusion mRNA: 5' partner up to ``break5`` + 3' partner from ``break3``
    (both 1-based transcript coordinates; junction after ``break5``)."""
    return tx5[:break5] + tx3[break3 - 1:]


def simulate_pairs(
    rng: np.random.Generator,
    transcript: str,
    n_pairs: int,
    read_len: int = 101,
    insert: int = 200,
    insert_sd: int = 20,
    error_rate: float = 0.001,
    name_prefix: str = "sim",
) -> Tuple[List[str], List[str], List[str]]:
    """wgsim-style pairs: (names, mate1 seqs, mate2 seqs).

    Fragment of ~``insert`` bp sampled uniformly; mate1 = 5' end forward,
    mate2 = 3' end reverse-complemented (utils/simulate_reads.py:20 flags).
    """
    L = len(transcript)
    names, r1, r2 = [], [], []
    enc = encode_ascii(transcript)
    for i in range(n_pairs):
        ins = max(read_len, int(rng.normal(insert, insert_sd)))
        ins = min(ins, L)
        start = int(rng.integers(0, L - ins + 1))
        frag = enc[start:start + ins]
        m1 = frag[:read_len].copy()
        m2 = revcomp(frag[-read_len:]).copy()
        for m in (m1, m2):
            errs = np.nonzero(rng.random(read_len) < error_rate)[0]
            for e in errs:
                m[e] = (m[e] + int(rng.integers(1, 4))) % 4
        names.append(f"{name_prefix}_{start}_{start+ins}_{i}")
        r1.append(decode_to_str(m1))
        r2.append(decode_to_str(m2))
    return names, r1, r2


def coverage_to_pairs(transcript_len: int, coverage: float, read_len: int = 101) -> int:
    """N = ceil(L * coverage / (2 * read_len)) (wgsim -N convention)."""
    return int(np.ceil(transcript_len * coverage / (2 * read_len)))


def write_fastq_pair(path1: str, path2: str, names: Sequence[str],
                     r1: Sequence[str], r2: Sequence[str]):
    """Write simulated reads as a (possibly gzipped) FASTQ pair."""
    def _dump(path, seqs, mate):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "wt") as fh:
            for n, s in zip(names, seqs):
                fh.write(f"@{n}/{mate}\n{s}\n+\n{'I' * len(s)}\n")
    _dump(path1, r1, 1)
    _dump(path2, r2, 2)


def main(argv=None) -> int:
    """Coverage-titration simulator CLI (utils/simulate_reads.py:4-20 parity).

    For each fusion transcript FASTA record and each coverage in the ladder,
    writes a wgsim-convention FASTQ pair ``<out>/<name>_cov<k>_{1,2}.fastq.gz``.
    """
    import argparse
    from anchored_fusion_tpu.io.fasta import iter_fasta

    ap = argparse.ArgumentParser(
        prog="anchored-fusion-simulate",
        description="wgsim-style paired-end simulator over fusion transcripts")
    ap.add_argument("--transcripts", required=True,
                    help="FASTA of fusion transcripts (one record per fusion)")
    ap.add_argument("--out_folder", required=True)
    ap.add_argument("--coverages", default="2,4,8,16,32,64,128",
                    help="comma-separated coverage ladder (default 2..128)")
    ap.add_argument("--read_len", type=int, default=101)
    ap.add_argument("--insert", type=int, default=200)
    ap.add_argument("--error_rate", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import os
    os.makedirs(args.out_folder, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    covs = [float(c) for c in args.coverages.split(",")]
    for header, tx in iter_fasta(args.transcripts):
        name = header.split(" ")[0]
        for cov in covs:
            n = coverage_to_pairs(len(tx), cov, args.read_len)
            names, r1, r2 = simulate_pairs(
                rng, tx, n, read_len=args.read_len, insert=args.insert,
                error_rate=args.error_rate, name_prefix=name)
            tag = f"{name}_cov{cov:g}"
            write_fastq_pair(os.path.join(args.out_folder, f"{tag}_1.fastq.gz"),
                             os.path.join(args.out_folder, f"{tag}_2.fastq.gz"),
                             names, r1, r2)
            print(f"{tag}: {n} pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
