"""Structured per-stage counters, JSON logs, and profiler hooks.

The reference's only observability is scattered ``print``s (SURVEY §5);
here every pipeline stage records wall time, named counters (reads in/out
per filter, candidate counts) and optional throughput into one JSON document
per run, and each stage can be annotated into a ``jax.profiler`` trace for
XProf/TensorBoard inspection (``profile_dir`` or env AFT_PROFILE_DIR).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class StageLogger:
    def __init__(self, name: str, profile_dir: Optional[str] = None):
        self.name = name
        self.stats: Dict[str, float] = {}
        self._t0 = time.time()
        self.profile_dir = profile_dir or os.environ.get("AFT_PROFILE_DIR")
        self._tracing = False
        if self.profile_dir:
            import atexit
            import jax
            os.makedirs(self.profile_dir, exist_ok=True)
            jax.profiler.start_trace(self.profile_dir)
            self._tracing = True
            # flush the trace even when the run raises before dump()
            atexit.register(self._stop_trace)

    def _stop_trace(self):
        if self._tracing:
            import jax
            jax.profiler.stop_trace()
            self._tracing = False
            self.stats["profile_dir"] = self.profile_dir

    @contextlib.contextmanager
    def stage(self, name: str, items: Optional[int] = None,
              unit: str = "reads"):
        """Time one stage; with ``items``, also record items/s throughput.

        Under an active profiler trace the stage body is wrapped in a named
        TraceAnnotation so device ops group per pipeline stage in XProf.
        """
        ctx = contextlib.nullcontext()
        if self._tracing:
            import jax
            ctx = jax.profiler.TraceAnnotation(f"{self.name}.{name}")
        t = time.time()
        try:
            with ctx:
                yield self
        finally:
            dt = time.time() - t
            self.stats[f"time.{name}_s"] = round(dt, 3)
            line = f"[{self.name}] {name}: {dt:.2f}s"
            if items is not None and dt > 0:
                rate = items / dt
                self.stats[f"rate.{name}_{unit}_per_s"] = round(rate, 1)
                line += f" ({rate:,.0f} {unit}/s)"
            print(line)

    def set(self, **kwargs):
        for k, v in kwargs.items():
            self.stats[k] = v

    def dump(self, path: str):
        self.stats["time.total_s"] = round(time.time() - self._t0, 3)
        self._stop_trace()
        with open(path, "w") as fh:
            json.dump({"run": self.name, "stats": self.stats}, fh, indent=1,
                      default=str)
