"""FASTA reader producing an in-memory encoded reference.

Replaces both the raw FASTA plumbing of the reference drivers
(Anchored_Fusion.py:123-165 splits the anchored multi-FASTA per gene) and
``bedtools getfasta`` (functions.py:965, :985, :1583, :1677): with the genome
held as one packed int8 array plus contig offsets, interval extraction is a
simple slice — no temp BED/FASTA files, no subprocesses.
"""

from __future__ import annotations

import dataclasses
import gzip
import re
from typing import Dict, Iterator, List, Tuple

import numpy as np

from anchored_fusion_tpu.ops.encode import encode_ascii, revcomp, decode_to_str


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def iter_fasta(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (header, sequence) pairs from a (possibly gzipped) FASTA file."""
    name, chunks = None, []
    with _open(path) as fh:
        for line in fh:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name, chunks = line[1:], []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)


def extract_gene_names(path: str) -> List[str]:
    """Gene-name extraction from anchored-FASTA headers.

    Parity with Anchored_Fusion.py:58-73: drop accession-like tokens
    (``XX_123.4``) and tokens containing gene/specie/trans/for/homo/sapiens
    (case-insensitive); the first surviving token is the gene name.
    """
    names = []
    for header, _ in iter_fasta(path):
        arr = header.split(" ")
        kept = []
        for tok in arr:
            if re.match(r"[a-zA-Z]+_\d+\.\d+", tok):
                continue
            if re.search(r"gene|specie|trans|for|homo|sapiens", tok, re.IGNORECASE):
                continue
            kept.append(tok)
        if kept:
            names.append(kept[0])
    return names


@dataclasses.dataclass
class Reference:
    """A packed reference: all contigs concatenated into one int8 array.

    ``seq`` is the concatenation (code space of ops.encode); contig ``i``
    occupies ``[starts[i], starts[i] + lengths[i])``.  Global coordinates are
    used on device; (contig, 1-based pos) at the API boundary.
    """

    names: List[str]
    starts: np.ndarray   # int64 (C,)
    lengths: np.ndarray  # int64 (C,)
    seq: np.ndarray      # int8 (L_total,)
    _name_to_id: Dict[str, int] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if not self._name_to_id:
            self._name_to_id = {n: i for i, n in enumerate(self.names)}

    @property
    def total_length(self) -> int:
        return int(self.seq.shape[0])

    def contig_id(self, name: str) -> int:
        return self._name_to_id[name]

    def to_global(self, contig: str, pos1: int) -> int:
        """(contig, 1-based position) -> 0-based global offset."""
        return int(self.starts[self._name_to_id[contig]]) + pos1 - 1

    def to_local(self, gpos: int) -> Tuple[str, int]:
        """0-based global offset -> (contig, 1-based position)."""
        cid = int(np.searchsorted(self.starts, gpos, side="right")) - 1
        return self.names[cid], int(gpos - self.starts[cid]) + 1

    def fetch(self, contig: str, start1: int, end1: int, strand: str = "+") -> np.ndarray:
        """Fetch codes for the 1-based inclusive interval [start1, end1].

        ``strand='-'`` returns the reverse complement (bedtools getfasta -s
        semantics, functions.py:1583/:1677).
        """
        cid = self._name_to_id[contig]
        s = int(self.starts[cid])
        start1 = max(1, start1)
        end1 = min(int(self.lengths[cid]), end1)
        if end1 < start1:
            return np.zeros(0, dtype=np.int8)
        out = self.seq[s + start1 - 1 : s + end1]
        if strand == "-":
            out = revcomp(out)
        return out

    def fetch_str(self, contig: str, start1: int, end1: int, strand: str = "+") -> str:
        return decode_to_str(self.fetch(contig, start1, end1, strand))


def read_fasta(path: str) -> Reference:
    names, starts, lengths, chunks = [], [], [], []
    off = 0
    for header, seq in iter_fasta(path):
        name = header.split(" ")[0].split("\t")[0]
        enc = encode_ascii(seq)
        names.append(name)
        starts.append(off)
        lengths.append(len(enc))
        chunks.append(enc)
        off += len(enc)
    if not names:
        raise ValueError(f"empty FASTA: {path}")
    return Reference(
        names=names,
        starts=np.asarray(starts, dtype=np.int64),
        lengths=np.asarray(lengths, dtype=np.int64),
        seq=np.concatenate(chunks) if chunks else np.zeros(0, np.int8),
    )


def reference_from_dict(seqs: Dict[str, str]) -> Reference:
    """Build a Reference from {name: sequence} (test fixtures, candidate FASTAs)."""
    names, starts, lengths, chunks = [], [], [], []
    off = 0
    for name, seq in seqs.items():
        enc = encode_ascii(seq) if isinstance(seq, (str, bytes)) else np.asarray(seq, np.int8)
        names.append(name)
        starts.append(off)
        lengths.append(len(enc))
        chunks.append(enc)
        off += len(enc)
    return Reference(
        names=names,
        starts=np.asarray(starts, dtype=np.int64),
        lengths=np.asarray(lengths, dtype=np.int64),
        seq=np.concatenate(chunks) if chunks else np.zeros(0, np.int8),
    )
