"""Content-addressed stage cache.

The reference's only resume mechanism is file-existence memoization of every
expensive artifact (bwa indexes, BAMs, homo_genes.bed — Anchored_Fusion.py:
167-203, functions.py:340); stale artifacts are silently reused even when
inputs changed.  Here stages are cached under a digest of their actual
inputs: same inputs -> cache hit, changed inputs -> recompute, no staleness.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Any, Callable, Optional

import numpy as np


def digest(*parts) -> str:
    """Stable content digest over arrays / bytes / JSON-able values."""
    h = hashlib.sha256()
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(str(p.dtype).encode())
            h.update(str(p.shape).encode())
            h.update(np.ascontiguousarray(p).tobytes())
        elif isinstance(p, bytes):
            h.update(p)
        else:
            h.update(json.dumps(p, sort_keys=True, default=str).encode())
        h.update(b"\x00")
    return h.hexdigest()[:32]


class StageCache:
    def __init__(self, directory: Optional[str]):
        self.dir = directory
        if directory:
            os.makedirs(directory, exist_ok=True)

    def _path(self, stage: str, key: str) -> str:
        return os.path.join(self.dir, f"{stage}_{key}.pkl")

    def get(self, stage: str, key: str):
        """(hit, value)."""
        if not self.dir:
            return False, None
        p = self._path(stage, key)
        if not os.path.exists(p):
            return False, None
        try:
            with open(p, "rb") as fh:
                return True, pickle.load(fh)
        except Exception:
            return False, None

    def put(self, stage: str, key: str, value: Any):
        if not self.dir:
            return
        p = self._path(stage, key)
        tmp = p + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(value, fh)
        os.replace(tmp, p)

    def cached(self, stage: str, key: str, fn: Callable[[], Any]):
        hit, val = self.get(stage, key)
        if hit:
            return val
        val = fn()
        self.put(stage, key, val)
        return val
