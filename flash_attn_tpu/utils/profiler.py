"""Profiler trace capture helpers.

Counterpart of the reference's `pytorch_profiler`
(`flash_attn/utils/benchmark.py:202`): wrap a callable, capture a
`jax.profiler` trace (viewable in TensorBoard / Perfetto), and return the
trace directory.  Used to diagnose kernel-level perf (DMA stalls, MXU
occupancy) the chained-timing harness can't see.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time

import jax


def profile_trace(fn, *args, trace_dir: str | None = None, iters: int = 3,
                  warmup: int = 1, host_profiler: bool = False):
    """Run `fn(*args)` under a jax.profiler trace.

    Returns (result, trace_dir).  The trace lands in
    `<trace_dir>/plugins/profile/...` — open with TensorBoard's profile
    plugin or `perfetto_link=True` below.
    """
    trace_dir = trace_dir or os.path.join(
        "/tmp", f"jax-trace-{int(time.time())}")
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return out, trace_dir


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace (torch.profiler.record_function role)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def summarize_trace(trace_dir: str, top: int = 15):
    """Parse the trace.json.gz event file and return the `top` ops by
    total duration — a quick host-side view without TensorBoard."""
    pats = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not pats:
        return []
    with gzip.open(sorted(pats)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    totals = {}
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            totals[name] = totals.get(name, 0.0) + ev["dur"]
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [(name, dur_us / 1e3) for name, dur_us in ranked]  # ms
