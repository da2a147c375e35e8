"""
Tracing / profiling hooks.

The reference has no profiling beyond plmc's own iteration log
(SURVEY: the wrapper parses stderr into an iteration table,
reference couplings/tools.py:20-108). This module adds the TPU-native
observability layer on top of that:

- `stage_timer` — wall-clock spans for pipeline stages (or any scope),
  collected into a process-global registry and dumped as a
  `<prefix>_runtime.csv` table by the pipeline runtime.
- `device_trace` — a `jax.profiler` trace scope (TensorBoard/Perfetto
  format) gated by the EVCOUPLINGS_TRACE_DIR environment variable or
  an explicit directory, so production runs pay zero overhead unless
  tracing is requested.
- `annotate` — a named `jax.profiler.TraceAnnotation` region so
  individual kernels (reweighting, PLM step, mean-field inversion)
  are attributable inside a device trace.

All hooks are no-ops when unused; none of them require TPU hardware.
"""

import contextlib
import os
import time

import pandas as pd

TRACE_DIR_ENV = "EVCOUPLINGS_TRACE_DIR"

# process-global span registry: list of (scope, start_unix, seconds)
_SPANS = []


def clear_spans():
    """Reset the collected timing spans (used between pipeline jobs)."""
    del _SPANS[:]


def get_spans():
    """Collected spans as a DataFrame with scope/start/seconds columns."""
    return pd.DataFrame(_SPANS, columns=["scope", "start", "seconds"])


def write_span_table(filename):
    """Persist collected spans as CSV; returns the path (or None if no
    spans were collected)."""
    if not _SPANS:
        return None
    get_spans().to_csv(filename, index=False)
    return filename


@contextlib.contextmanager
def stage_timer(scope):
    """Record the wall-clock duration of a scope into the span
    registry (and yield the running span dict for inspection)."""
    span = {"scope": scope, "start": time.time()}
    t0 = time.perf_counter()
    try:
        yield span
    finally:
        span["seconds"] = time.perf_counter() - t0
        _SPANS.append((scope, span["start"], span["seconds"]))


@contextlib.contextmanager
def device_trace(trace_dir=None):
    """jax.profiler trace scope.

    If trace_dir is None, the EVCOUPLINGS_TRACE_DIR environment
    variable selects the output directory; when neither is set this is
    a no-op, so callers can wrap hot sections unconditionally.
    """
    trace_dir = trace_dir or os.environ.get(TRACE_DIR_ENV)
    if not trace_dir:
        yield
        return

    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name):
    """Named trace annotation context for attributing device work
    inside a profiler trace; cheap enough to leave on always."""
    import jax

    return jax.profiler.TraceAnnotation(name)
