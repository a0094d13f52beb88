"""Structured run metrics + profiler traces (SURVEY §5: the TPU-native
replacement for the reference's ProgressMeter-only observability).

Two surfaces, both wired to `odgi_tpu sort` / `odgi_tpu layout`:

- `--metrics FILE`: JSONL step metrics — one line per iteration
  {iter, wall_s, delta_max} plus a final run-summary line.  Requesting
  metrics routes the run through the per-iteration driver (the fused
  Pallas path runs the whole schedule in one dispatch and has no
  per-iteration host visibility by design).
- `--profile DIR`: wraps the optimization in `jax.profiler.trace(DIR)`;
  the resulting trace (xplane + perfetto json) opens in TensorBoard /
  Perfetto and contains the device-side kernel timeline.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class StepMetrics:
    """Collects per-iteration (or run-summary) records and writes JSONL."""

    def __init__(self, path: str, kind: str):
        self.path = path
        self.kind = kind
        self.t0 = time.time()
        self.records: list = []
        self._last = None

    def record_iteration(self, it: int, coords, eta: Optional[float] = None):
        import numpy as np

        c = np.asarray(coords, dtype=float)
        dmax = (
            float(np.abs(c - self._last).max()) if self._last is not None else None
        )
        self._last = c
        rec = {
            "kind": self.kind,
            "iter": int(it),
            "wall_s": round(time.time() - self.t0, 4),
        }
        if eta is not None:
            rec["eta"] = float(eta)
        if dmax is not None:
            rec["delta_max"] = round(dmax, 6)
        self.records.append(rec)

    def record_summary(self, **fields):
        rec = {"kind": f"{self.kind}_summary",
               "wall_s": round(time.time() - self.t0, 4)}
        rec.update(fields)
        self.records.append(rec)

    def write(self):
        with open(self.path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler.trace(trace_dir) when requested, else a no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
