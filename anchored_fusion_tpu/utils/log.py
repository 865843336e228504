"""Structured per-stage counters and JSON logs.

The reference's only observability is scattered ``print``s (SURVEY §5);
here every pipeline stage records wall time and named counters (reads
in/out per filter, candidate counts) into one JSON document per run.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict


class StageLogger:
    def __init__(self, name: str):
        self.name = name
        self.stats: Dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield self
        finally:
            self.stats[f"time.{name}_s"] = round(time.time() - t, 3)
            print(f"[{self.name}] {name}: {self.stats[f'time.{name}_s']:.2f}s")

    def set(self, **kwargs):
        for k, v in kwargs.items():
            self.stats[k] = v

    def dump(self, path: str):
        self.stats["time.total_s"] = round(time.time() - self._t0, 3)
        with open(path, "w") as fh:
            json.dump({"run": self.name, "stats": self.stats}, fh, indent=1,
                      default=str)
