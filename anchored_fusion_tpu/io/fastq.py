"""Paired-end FASTQ reader -> fixed-shape int8 batches.

The reference streams FASTQ through bwa (Anchored_Fusion.py:182) and never
touches the reads in Python; here reads become a ``ReadBatch`` of packed
int8 arrays, padded to a fixed lane width so every downstream kernel sees
static shapes (XLA requirement, SURVEY §7.3 item 4).
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import List, Optional, Tuple

import numpy as np

from anchored_fusion_tpu.ops.encode import encode_ascii, PAD


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


@dataclasses.dataclass
class ReadBatch:
    """A batch of paired-end reads.

    ``seq`` is (N, 2, L) int8 (mate 0 / mate 1, PAD-padded); ``length`` is
    (N, 2) int32 true lengths; ``names`` is the host-side read-name list
    (read names only matter at reporting time: functions.py:1783).
    """

    names: List[str]
    seq: np.ndarray      # (N, 2, L) int8
    length: np.ndarray   # (N, 2) int32

    @property
    def n_pairs(self) -> int:
        return int(self.seq.shape[0])

    @property
    def max_len(self) -> int:
        return int(self.seq.shape[2])

    def pad_to(self, n_pairs: int) -> "ReadBatch":
        """Right-pad with empty pairs to a fixed batch size."""
        if n_pairs <= self.n_pairs:
            return self
        extra = n_pairs - self.n_pairs
        seq = np.concatenate(
            [self.seq, np.full((extra, 2, self.max_len), PAD, np.int8)], axis=0)
        length = np.concatenate([self.length, np.zeros((extra, 2), np.int32)], axis=0)
        return ReadBatch(self.names + [""] * extra, seq, length)


def _read_one(path: str) -> Tuple[List[str], List[np.ndarray]]:
    names, seqs = [], []
    with _open(path) as fh:
        while True:
            h = fh.readline()
            if not h:
                break
            s = fh.readline().strip()
            fh.readline()
            fh.readline()
            name = h.strip()[1:].split(" ")[0].split("\t")[0]
            # Strip trailing /1 or /2 mate suffix, like bwa does.
            if name.endswith("/1") or name.endswith("/2"):
                name = name[:-2]
            names.append(name)
            seqs.append(encode_ascii(s))
    return names, seqs


def read_fastq_pair(path1: str, path2: str, max_len: Optional[int] = None) -> ReadBatch:
    names1, seqs1 = _read_one(path1)
    names2, seqs2 = _read_one(path2)
    if len(names1) != len(names2):
        raise ValueError(
            f"unpaired FASTQ: {len(names1)} vs {len(names2)} reads")
    if max_len is None:
        longest = max((len(s) for s in seqs1 + seqs2), default=0)
        max_len = max(8, -(-longest // 128) * 128)  # round up to lane width
    n = len(names1)
    seq = np.full((n, 2, max_len), PAD, dtype=np.int8)
    length = np.zeros((n, 2), dtype=np.int32)
    for i, (s1, s2) in enumerate(zip(seqs1, seqs2)):
        l1, l2 = min(len(s1), max_len), min(len(s2), max_len)
        seq[i, 0, :l1] = s1[:l1]
        seq[i, 1, :l2] = s2[:l2]
        length[i, 0], length[i, 1] = l1, l2
    return ReadBatch(names1, seq, length)


def batch_from_arrays(names, seqs, max_len: int) -> ReadBatch:
    """Build a single-end ReadBatch (mate-1 slots empty) from encoded arrays."""
    n = len(seqs)
    seq = np.full((n, 2, max_len), PAD, dtype=np.int8)
    length = np.zeros((n, 2), dtype=np.int32)
    for i, s in enumerate(seqs):
        l = min(len(s), max_len)
        seq[i, 0, :l] = s[:l]
        length[i, 0] = l
    return ReadBatch(list(names), seq, length)
