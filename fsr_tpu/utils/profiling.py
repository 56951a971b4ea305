"""Per-pass timing utilities (the GPUTimestamps/profiler-window analog).

The reference samples GPU timestamps around every pass and shows them in an
ImGui profiler (SampleRenderer.cpp:708, FSRSample.cpp:767-843).  On TPU the
equivalent is the XLA op-level trace: `op_times` runs a function under
jax.profiler and aggregates device-op durations, which is also the only
reliable timing source on tunneled/shared devices where wall-clock
dispatch latency swamps kernel time.
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import tempfile
from typing import Callable, Dict, Optional

import jax

__all__ = ["op_times", "trace_annotation"]


def op_times(
    fn: Callable[[], object],
    iters: int = 3,
    trace_dir: Optional[str] = None,
    min_ms: float = 0.001,
) -> Dict[str, float]:
    """Run `fn` under the JAX profiler; return per-op device ms (averaged).

    fn should invoke already-jitted work and block on the result.  The
    first call runs outside the trace to exclude compilation.
    """
    r = fn()
    jax.block_until_ready(r)
    d = trace_dir or tempfile.mkdtemp(prefix="fsr_tpu_trace_")
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(iters):
            jax.block_until_ready(fn())
    out: Dict[str, float] = {}
    for path in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(path))
        events = data.get("traceEvents", [])
        # Device time appears on several tracks at once ("XLA Modules" =
        # whole-module rows, "XLA Ops" = per-op rows, plus host python
        # frames); summing everything double-counts.  Aggregate only the
        # per-op device track(s) when present.
        op_tracks = {
            (e["pid"], e.get("tid"))
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Ops"
        }
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if op_tracks:
                if (e.get("pid"), e.get("tid")) not in op_tracks:
                    continue
            else:  # fallback (e.g. CPU-only traces): old name heuristic
                name = e.get("name", "?")
                if name.startswith("$") or "/" in name[:2]:
                    continue  # host-side python frames
            out[e.get("name", "?")] = out.get(e.get("name", "?"), 0.0) + e["dur"]
    if trace_dir is None:
        shutil.rmtree(d, ignore_errors=True)
    return {
        k: v / iters / 1e3
        for k, v in sorted(out.items(), key=lambda kv: -kv[1])
        if v / iters / 1e3 >= min_ms
    }


def trace_annotation(name: str):
    """Named scope for traces (the UserMarker / SetPerfMarker analog)."""
    return jax.profiler.TraceAnnotation(name)
