"""Profiling hooks (SURVEY.md §5 tracing plan; reference has prints only).

``capture_trace`` wraps jax.profiler and produces an xprof-compatible trace
directory; enabled per-process with EVOSSEARCH_PROFILE_DIR (each capture
lands as a timestamped run under that directory) or ad hoc around any code
block. It is wired into the hot routes (/search, /search_by_image, /index
— server/app.py) and around every bench phase (bench.py); per-stage
``StageTimer`` regions double as xprof ``TraceAnnotation`` spans while
profiling is on, so the decode/prepare/encode/search stages are visible on
the trace timeline. Per-request wall timing lives in utils.logging and is
exposed at /stats regardless of profiling.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_active = threading.Lock()  # jax.profiler: ONE active trace per process


def enabled() -> bool:
    """Whether trace capture is configured for this process."""
    return bool(os.environ.get("EVOSSEARCH_PROFILE_DIR"))


@contextmanager
def capture_trace(log_dir: str | None = None):
    """jax.profiler trace around a block; no-op when no directory is set.

    Concurrency guard: jax.profiler supports one active trace per
    process, so a request landing while another is being traced simply
    proceeds untraced instead of raising mid-request.
    """
    log_dir = log_dir or os.environ.get("EVOSSEARCH_PROFILE_DIR")
    if not log_dir:
        yield
        return
    if not _active.acquire(blocking=False):
        yield
        return
    try:
        import jax

        with jax.profiler.trace(log_dir):
            yield
    finally:
        _active.release()


@contextmanager
def annotate(name: str):
    """Named region visible in xprof timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
