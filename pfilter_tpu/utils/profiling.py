"""Tracing / profiling helpers — the structured replacement for the
reference's ad-hoc ``std::chrono`` + ``ROS_INFO`` per-stage prints
(SURVEY.md §5; ref: src/laserProcessingNode.cpp:71-79,
src/odomEstimationNode.cpp:133-141, src/preProcess.cpp:71-344).

- :class:`StageTimer` — wall-clock per named stage with device sync, JSONL
  emission, and summary statistics.
- :func:`device_trace` — context manager around ``jax.profiler`` producing
  xprof/TensorBoard-compatible traces of the compiled pipeline.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Optional

import jax
import numpy as np


class StageTimer:
    """Accumulates per-stage wall times; ``sync=True`` blocks on the device
    so a stage's async dispatch is charged to the stage that launched it."""

    def __init__(self, sync: bool = True, jsonl_path: Optional[str] = None):
        self.sync = sync
        self.times = defaultdict(list)
        self._fh = open(jsonl_path, "w") if jsonl_path else None

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if self.sync:
            target = out.get("result", result)
            if target is not None:
                jax.block_until_ready(target)
        ms = (time.perf_counter() - t0) * 1e3
        self.times[name].append(ms)
        if self._fh:
            self._fh.write(json.dumps({"stage": name, "ms": round(ms, 3)}) + "\n")
            self._fh.flush()

    def summary(self) -> dict:
        out = {}
        for name, ts in self.times.items():
            a = np.asarray(ts)
            out[name] = {
                "n": len(a),
                "mean_ms": round(float(a.mean()), 3),
                "p50_ms": round(float(np.percentile(a, 50)), 3),
                "p95_ms": round(float(np.percentile(a, 95)), 3),
                "total_ms": round(float(a.sum()), 3),
            }
        return out

    def report(self) -> str:
        rows = sorted(self.summary().items(), key=lambda kv: -kv[1]["total_ms"])
        lines = [f"{'stage':<28}{'n':>6}{'mean':>10}{'p50':>10}{'p95':>10}{'total':>12}"]
        for name, s in rows:
            lines.append(
                f"{name:<28}{s['n']:>6}{s['mean_ms']:>10.2f}{s['p50_ms']:>10.2f}"
                f"{s['p95_ms']:>10.2f}{s['total_ms']:>12.1f}"
            )
        return "\n".join(lines)

    def close(self):
        if self._fh:
            self._fh.close()


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """Capture an xprof trace of everything dispatched inside the block:
    ``with device_trace('/tmp/trace'): pipe.process_frame(...)``."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
