"""Profiling / tracing utilities (observability the reference lacks).

The reference's only instrumentation is tqdm + an unused MetricLogger
(SURVEY.md §5). Here: a trace context manager around ``jax.profiler`` plus a
summarizer that aggregates device-op time by model module and op kind —
the tool that localized the encoder-MSDA gather bottleneck on v5e.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(log_dir: str):
    """``with device_trace('/tmp/trace'): run_steps()`` — wraps
    jax.profiler.trace; works over the axon TPU tunnel."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def load_trace_events(log_dir: str):
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    return [e for e in trace.get("traceEvents", [])
            if e.get("ph") == "X" and "dur" in e]


def summarize_trace(log_dir: str, iterations: int = 1,
                    module_regex: str = r"EgtrModel/([^ ]*)"
                    ) -> Dict[str, Dict[str, float]]:
    """Aggregate device time by (collapsed) module path and op kind.

    Returns {"by_module": {...ms...}, "by_op": {...ms...},
             "total_ms": float} per iteration.
    """
    events = load_trace_events(log_dir)
    dev = [e for e in events
           if not e["name"].startswith("$")
           and not e["name"].startswith("jit_")
           and not e["name"].startswith("np.")
           and not e["name"].startswith("Pjit")]
    by_module: collections.Counter = collections.Counter()
    by_op: collections.Counter = collections.Counter()
    for e in dev:
        top = e.get("args", {}).get("tf_op", "")
        m = re.search(module_regex, top)
        key = re.sub(r"_(\d+)/", "_N/", m.group(1)) if m else "<other>"
        by_module["/".join(key.split("/")[:3])] += e["dur"]
        m2 = re.search(
            r"(gather|conv_general|dot_general|scatter|transpose|reduce"
            r"|select_n|sort|top_k|while|pad)", top)
        kind = m2.group(1) if m2 else (
            "convert/copy" if ("convert" in e["name"] or "copy" in e["name"])
            else "other")
        by_op[kind] += e["dur"]
    scale = 1e3 * iterations
    return {
        "total_ms": sum(e["dur"] for e in dev) / scale,
        "by_module": {k: v / scale for k, v in by_module.most_common()},
        "by_op": {k: v / scale for k, v in by_op.most_common()},
    }


class StepTimer:
    """Wall-clock step timing with warmup skip (MetricLogger.log_every
    analog, util/misc.py:199-270, but actually wired in)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self._times.append(dt)

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self._times) / max(len(self._times), 1)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self._times:
            return {}
        a = 1e3 * np.asarray(self._times)
        return {"mean_ms": float(a.mean()), "p50_ms": float(np.median(a)),
                "p95_ms": float(np.percentile(a, 95)),
                "steps": len(self._times)}
