"""Profiling hooks (SURVEY §5.1 — the reference has none; its residue is an
unused pstats import and commented per-sample timers). TPU-native answer:
jax.profiler traces viewable in TensorBoard/Perfetto, captured for a few
steady-state steps."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def step_trace(profile_dir: str | None, step: int, start: int = 10,
               num: int = 3):
    """Trace steps [start, start+num) of an epoch into profile_dir."""
    if profile_dir and step == start:
        jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        if profile_dir and step == start + num - 1:
            jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the trace viewer."""
    return jax.profiler.TraceAnnotation(name)
