"""GTF exon interval index.

Re-design of the reference's ``Gene_co`` (functions.py:7-86): parse GTF exon
rows keeping gene_id/gene_name, drop pseudogene/artifact/protein_coding_LoF
transcripts, inject the hard-coded IGH@/TRA@ loci, sort and merge overlapping
same-gene intervals (functions.py:40-58).  Queries run as numpy searchsorted
over per-chromosome coordinate arrays — vectorizable over whole read batches —
with the reference's +-10bp containment slack (functions.py:73-84).

Intervals are exposed both as python lists (exact exon-walk parity, the walker
indexes ``dic[chrom][exon_num]`` directly: functions.py:1341-1390) and as numpy
arrays for batched queries.
"""

from __future__ import annotations

import dataclasses
import gzip
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Hard-coded immunoglobulin / T-cell-receptor loci (functions.py:40-46).
_INJECTED_LOCI = {
    "chr14": [(105586337, 106879944, "IGH@", "IGH@"), (21621804, 22552332, "TRA@", "TRA@")],
    "KI270846.1": [(0, 1351393, "IGH@", "IGH@")],
}
_DROPPED_TYPES = ("artifact", "protein_coding_LoF")


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


_ATTR_RE = re.compile(r'(\w+)\s+"([^"]*)"')


def parse_gtf_exons(path: str) -> Dict[str, List[List]]:
    """Parse GTF exon rows -> {chrom: [[start, end, gene_id, gene_name], ...]}.

    Attribute handling matches functions.py:18-35: gene_id / gene_name /
    transcript_type are read, rows whose transcript_type contains
    'pseudogene' or equals artifact / protein_coding_LoF are skipped.
    """
    dic: Dict[str, List[List]] = {}
    with _open(path) as fh:
        for line in fh:
            if line.startswith("##"):
                continue
            arr = line.split("\t")
            if len(arr) < 9 or arr[2] != "exon":
                continue
            gene_id, gene_name, ttype = "", "", ""
            for key, val in _ATTR_RE.findall(arr[8]):
                if key == "gene_id":
                    gene_id = val
                elif key == "gene_name":
                    gene_name = val
                elif key == "transcript_type":
                    ttype = val
            if "pseudogene" in ttype or ttype in _DROPPED_TYPES:
                continue
            dic.setdefault(arr[0], []).append([int(arr[3]), int(arr[4]), gene_id, gene_name])
    return dic


def parse_gtf_genes(path: str) -> List[Tuple[str, int, int, str, str, str]]:
    """GTF gene rows -> [(chrom, start, end, gene_id, gene_name, strand)].

    Used by the homolog mask, mirroring the ENSG-filtered gene-row extraction
    of Find_homo_genes (functions.py:351-364).
    """
    out = []
    with _open(path) as fh:
        for line in fh:
            if line.startswith("##"):
                continue
            arr = line.split("\t")
            if len(arr) < 9 or arr[2] != "gene":
                continue
            tmp = re.findall(r'gene_id\s+"(ENSG\d+\S+)";\s+.+gene_name\s+"(\S+)";\s+', arr[8])
            if tmp:
                out.append((arr[0], int(arr[3]), int(arr[4]), tmp[0][0], tmp[0][1], arr[6]))
    return out


@dataclasses.dataclass
class _ChromIndex:
    starts: np.ndarray  # int64 (E,)
    ends: np.ndarray    # int64 (E,)
    gene_ids: List[str]
    gene_names: List[str]


class ExonIndex:
    """Sorted, merged exon interval index with +-slack containment queries."""

    def __init__(self, dic: Dict[str, List[List]], slack: int = 10, inject_loci: bool = True):
        self.slack = slack
        dic = {k: [list(v) for v in vs] for k, vs in dic.items()}
        if inject_loci:
            for chrom, loci in _INJECTED_LOCI.items():
                dic.setdefault(chrom, [])
                for s, e, gid, gname in loci:
                    dic[chrom].append([s, e, gid, gname])
        # Sort and merge overlapping same-gene (or IGH@/TRA@) intervals
        # (functions.py:47-58).
        for value in dic.values():
            value.sort()
            i = 0
            while i < len(value) - 1:
                if value[i][1] >= value[i + 1][0] and (
                    value[i][2] == value[i + 1][2] or value[i][2] in ("IGH@", "TRA@")
                ):
                    if value[i][1] < value[i + 1][1]:
                        value[i][1] = value[i + 1][1]
                    del value[i + 1]
                    continue
                i += 1
        self.dic: Dict[str, List[List]] = dic
        self._arrays: Dict[str, _ChromIndex] = {}
        for chrom, value in dic.items():
            self._arrays[chrom] = _ChromIndex(
                starts=np.asarray([v[0] for v in value], dtype=np.int64),
                ends=np.asarray([v[1] for v in value], dtype=np.int64),
                gene_ids=[v[2] for v in value],
                gene_names=[v[3] for v in value],
            )

    @classmethod
    def from_gtf(cls, path: str, slack: int = 10) -> "ExonIndex":
        return cls(parse_gtf_exons(path), slack=slack)

    def find_exon(self, chrom: str, start: int, end: int):
        """Containment query with +-slack; returns (info5, exon_num).

        info5 = [gene_id, gene_name, chrom, exon_start, exon_end] or five empty
        strings; exon_num = -1 when not found.  Parity with Gene_co.Find_exon
        (functions.py:61-86) including the chrM exclusion.
        """
        empty = ["", "", "", "", ""]
        if chrom not in self._arrays or chrom == "chrM":
            return empty, -1
        ci = self._arrays[chrom]
        n = len(ci.starts)
        if n == 0:
            return empty, -1
        sl = self.slack
        # Index of last interval with start <= query start (the reference's
        # binary search lands here; functions.py:65-72).
        m = int(np.searchsorted(ci.starts, start, side="right")) - 1
        m = max(m, 0)

        def hit(i):
            return [ci.gene_ids[i], ci.gene_names[i], chrom, int(ci.starts[i]), int(ci.ends[i])], i

        if ci.starts[m] - sl <= start and ci.ends[m] + sl >= end:
            return hit(m)
        i = m - 1
        while i >= 0 and ci.starts[i] - sl <= start and ci.ends[i] + sl >= end:
            return hit(i)
        i = m + 1
        while i < n and ci.starts[i] - sl <= start:
            if ci.ends[i] + sl >= end:
                return hit(i)
            i += 1
        return empty, -1

    def find_exon_batch(self, chroms: Sequence[str], starts: np.ndarray, ends: np.ndarray):
        """Vectorized-ish batched query; returns (gene_ids, gene_names, exon_nums)."""
        gids, gnames, nums = [], [], []
        for c, s, e in zip(chroms, starts, ends):
            info, num = self.find_exon(c, int(s), int(e))
            gids.append(info[0])
            gnames.append(info[1])
            nums.append(num)
        return gids, gnames, np.asarray(nums, dtype=np.int64)

    def gene_span(self, chrom: str, gene_id: str) -> Optional[Tuple[int, int]]:
        """Min start / max end over all exons of a gene on one chromosome."""
        if chrom not in self._arrays:
            return None
        ci = self._arrays[chrom]
        sel = [i for i, g in enumerate(ci.gene_ids) if g == gene_id]
        if not sel:
            return None
        return int(ci.starts[sel].min()), int(ci.ends[sel].max())
