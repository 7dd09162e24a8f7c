"""Profiling utilities: the nerfstudio `profiler.time_function` equivalent
(which the reference wraps every pipeline entry with,
freegaussian_pipeline.py:52-174) plus jax.profiler trace capture.

Wall-time per function is accumulated into a module-level table and printed
with `profiler_summary()`; note that jitted calls are async — wrap the timed
region so it ends with a `block_until_ready` when you want device time."""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

_TOTALS: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


def time_function(fn):
    """Decorator accumulating wall time per call."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            _TOTALS[fn.__qualname__] += time.perf_counter() - t0
            _COUNTS[fn.__qualname__] += 1

    return wrapped


@contextlib.contextmanager
def profile_section(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TOTALS[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def profiler_summary(reset: bool = False) -> str:
    rows = sorted(_TOTALS.items(), key=lambda kv: -kv[1])
    lines = [f"{'name':<48} {'calls':>8} {'total s':>10} {'avg ms':>10}"]
    for name, total in rows:
        c = _COUNTS[name]
        lines.append(f"{name:<48} {c:>8} {total:>10.3f} {total / c * 1e3:>10.3f}")
    if reset:
        _TOTALS.clear()
        _COUNTS.clear()
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
