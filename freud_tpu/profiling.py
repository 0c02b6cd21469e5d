"""Lightweight tracing/profiling for pipeline stages.

The reference has no profiling beyond tqdm bars (SURVEY.md §5.1). Here every
hot pipeline stage wraps itself in ``span(name)``, which (a) accumulates
wall-clock per stage into a process-wide table, and (b) emits a
``jax.profiler.TraceAnnotation`` so stages show up on TPU profiler timelines
when a trace is being captured (``start_trace``/``stop_trace``).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Iterator, Optional

import jax

_lock = threading.Lock()
_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_durations: dict[str, list[float]] = defaultdict(list)
# Per-call samples kept per span, enough to decompose low-cadence stages
# (validate/checkpoint calls) without unbounded growth on per-batch spans.
_MAX_CALLS_KEPT = 2048


@contextlib.contextmanager
def span(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        # account failed invocations too — a raising stage would otherwise
        # vanish from the report, under-counting exactly what's being
        # debugged
        dt = time.perf_counter() - t0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1
            if len(_durations[name]) < _MAX_CALLS_KEPT:
                _durations[name].append(dt)


def stats() -> dict[str, dict[str, float]]:
    with _lock:
        return {
            k: {"total_s": _totals[k], "count": _counts[k],
                "mean_ms": 1e3 * _totals[k] / max(_counts[k], 1)}
            for k in _totals
        }


def calls(name: str) -> list[float]:
    """Per-call durations for ``name`` (first _MAX_CALLS_KEPT calls).

    Lets campaign decompositions split one-time costs (remote first-compile)
    from steady state, which the total/mean aggregates hide.
    """
    with _lock:
        return list(_durations.get(name, ()))


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()
        _durations.clear()


def report() -> str:
    lines = ["stage                     total_s   count   mean_ms"]
    for k, v in sorted(stats().items(), key=lambda kv: -kv[1]["total_s"]):
        lines.append(f"{k:<24} {v['total_s']:8.2f} {v['count']:7d} {v['mean_ms']:9.2f}")
    return "\n".join(lines)


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a TPU profiler trace into ``logdir`` (no-op when None)."""
    if logdir is None:
        yield
        return
    start_trace(logdir)
    try:
        yield
    finally:
        stop_trace()
