"""Profiling hooks (SURVEY.md §5 tracing plan; reference has prints only).

``capture_trace`` wraps jax.profiler and produces an xprof-compatible trace
directory; enable per-process with EVOSSEARCH_PROFILE_DIR or ad hoc around
any code block. Per-request stage timing lives in utils.logging.StageTimer
and is exposed at /stats.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def capture_trace(log_dir: str | None = None):
    """jax.profiler trace around a block; no-op when no directory is set."""
    log_dir = log_dir or os.environ.get("EVOSSEARCH_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextmanager
def annotate(name: str):
    """Named region visible in xprof timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
