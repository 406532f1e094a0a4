"""Profiling hooks — Perfetto-compatible trace capture.

Reference parity: flashinfer/profiler/__init__.py:52
(``export_to_perfetto_trace``) and the device-side event recorder
(include/flashinfer/profiler.cuh) whose (tag, timestamp) pairs it decodes.

TPU mapping: XLA already records every kernel (including each Pallas
kernel, named after its kernel function) with device timestamps — the role
the reference's PROFILER_EVENT macros play — so capture is
``jax.profiler.trace`` and the exported artifact is a Perfetto-loadable
trace (ui.perfetto.dev / tensorboard).  ``annotate`` adds host-side named
spans (the analogue of PROFILER_EVENT_INSTANT) that nest Pallas kernels
under op-level labels.  For per-step device timing without a trace viewer,
use testing.utils.bench_tpu_time_differential.
"""

from __future__ import annotations

import contextlib
import glob
import os
from typing import Iterator, Optional

__all__ = [
    "profile_trace",
    "annotate",
    "export_to_perfetto_trace",
    "latest_trace_path",
    "summarize_trace",
]


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/flashinfer_tpu_trace") -> Iterator[str]:
    """Capture a device+host trace of the enclosed region.

    Produces a .trace.json.gz under ``log_dir`` that Perfetto and
    TensorBoard both load (reference export_to_perfetto_trace,
    profiler/__init__.py:52).
    """
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


@contextlib.contextmanager
def annotate(name: str):
    """Named host-side span nested into the trace
    (reference PROFILER_EVENT_START/END, profiler.cuh:77-143)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def latest_trace_path(log_dir: str = "/tmp/flashinfer_tpu_trace") -> Optional[str]:
    """Path of the most recent Perfetto trace under log_dir, or None."""
    pats = [
        os.path.join(log_dir, "**", "*.trace.json.gz"),
        os.path.join(log_dir, "**", "*.trace.json"),
    ]
    hits: list[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    return max(hits, key=os.path.getmtime) if hits else None


def export_to_perfetto_trace(
    log_dir: str = "/tmp/flashinfer_tpu_trace",
    out_path: str = "trace.perfetto.json.gz",
) -> str:
    """Copy the newest captured trace to ``out_path`` (open in
    ui.perfetto.dev).  Name mirrors the reference API."""
    import shutil

    src = latest_trace_path(log_dir)
    if src is None:
        raise FileNotFoundError(
            f"no trace under {log_dir}; wrap the region in profile_trace()"
        )
    shutil.copyfile(src, out_path)
    return out_path


def summarize_trace(log_dir: str, top: int = 20):
    """Aggregate device-side event durations from a captured trace — the
    decoder role of the reference's profiler (its Python side parses the
    device (tag, timestamp) buffer into spans; here the spans already exist
    in the XLA trace and this collapses them per op name).

    Returns [(name, total_ms, count)] sorted by total time, device events
    only. Pallas kernels appear under their kernel function's name; engine
    layers under their jax.named_scope labels.
    """
    import gzip
    import json
    import collections

    path = latest_trace_path(log_dir)
    if path is None:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e["pid"], "")
            if "TPU" in pname or "/device" in pname:
                agg[e["name"]] += e["dur"]
                cnt[e["name"]] += 1
    return [
        (name, dur / 1e3, cnt[name]) for name, dur in agg.most_common(top)
    ]
