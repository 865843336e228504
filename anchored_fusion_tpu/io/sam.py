"""CIGAR algebra and minimal SAM interop.

The framework's native alignment records are clip/segment tuples and never
round-trip through SAM; this module exists for interoperability with
external BAM/SAM-producing tools and preserves the reference's CIGAR
normalization semantics (``deal_cigar``, functions.py:656-702):

  * N (intron skip): dropped, later ops shift left
  * D (deletion):    merged into the following op, read padded with N
  * I (insertion):   cut out of the read
  * H (hard clip):   dropped
  * adjacent M runs: merged

yielding the <=3-op S/M/S form every calling stage reasons about; the 2-op
SM/MS test (functions.py:919) becomes ``len(ops) == 2``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def parse_cigar(cigar: str) -> List[Tuple[int, str]]:
    """[(length, op), ...]; '*' -> []."""
    if cigar == "*" or not cigar:
        return []
    return [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]


def normalize_cigar(cigar: str, seq: str) -> Tuple[List[List], str]:
    """deal_cigar parity: returns ([cumulative_end, length, op], modified seq).

    The cumulative end is the 1-based read offset where each op ends after
    normalization — the representation all reference clustering code indexes
    ('=' and 'X' are folded into M first; the reference never sees them from
    bwa but external tools emit them).
    """
    ops = [(n, "M" if op in "=X" else op) for n, op in parse_cigar(cigar)]
    res: List[List] = []
    co = 0
    for n, op in ops:
        co += n
        res.append([co, n, op])
    i = 0
    while i < len(res):
        op = res[i][2]
        if op == "N":
            for j in range(i + 1, len(res)):
                res[j][0] -= res[i][1]
            del res[i]
        elif op == "D":
            if i != len(res) - 1:
                res[i + 1][1] += res[i][1]
            cut = res[i - 1][0] if i > 0 else 0
            seq = seq[:cut] + "N" * res[i][1] + seq[cut:]
            del res[i]
        elif op == "I":
            for j in range(i + 1, len(res)):
                res[j][0] -= res[i][1]
            seq = seq[:res[i - 1][0] if i > 0 else 0] + seq[res[i][0]:]
            del res[i]
        elif op == "H":
            for j in range(i + 1, len(res)):
                res[j][0] -= res[i][1]
            del res[i]
        elif op == "P":
            del res[i]
        else:
            i += 1
    i = 0
    while i < len(res) - 1:
        if res[i][2] == "M" and res[i + 1][2] == "M":
            res[i][0] = res[i + 1][0]
            res[i][1] += res[i + 1][1]
            del res[i + 1]
        else:
            i += 1
    return res, seq


def cigar_from_segment(read_len: int, read_start: int, read_end: int) -> str:
    """Our segment record -> SAM CIGAR (soft clips around one M run)."""
    left = read_start
    mid = read_end - read_start + 1
    right = read_len - 1 - read_end
    out = ""
    if left > 0:
        out += f"{left}S"
    out += f"{mid}M"
    if right > 0:
        out += f"{right}S"
    return out


SAM_FLAG_PAIRED = 0x1
SAM_FLAG_UNMAPPED = 0x4
SAM_FLAG_MATE_UNMAPPED = 0x8
SAM_FLAG_REVERSE = 0x10
SAM_FLAG_SECONDARY = 0x100
SAM_FLAG_QC_FAIL = 0x200
SAM_FLAG_DUP = 0x400
SAM_FLAG_SUPPLEMENTARY = 0x800


def write_sam(path: str, ref_name: str, ref_len: int, records):
    """Minimal SAM writer for interop/debugging.

    records: iterable of (name, flag, pos1, mapq, cigar, seq_str).
    """
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:unsorted\n")
        fh.write(f"@SQ\tSN:{ref_name}\tLN:{ref_len}\n")
        for name, flag, pos1, mapq, cigar, seq in records:
            fh.write(f"{name}\t{flag}\t{ref_name}\t{pos1}\t{mapq}\t{cigar}"
                     f"\t*\t0\t0\t{seq}\t*\n")


def read_sam(path: str):
    """Minimal SAM reader: yields (name, flag, rname, pos1, cigar, seq)."""
    with open(path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            a = line.rstrip("\n").split("\t")
            if len(a) < 11:
                continue
            yield a[0], int(a[1]), a[2], int(a[3]), a[5], a[9]
