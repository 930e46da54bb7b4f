"""Profiling/tracing hooks.

The reference's only instrumentation is whole-run wall clock
(main_fusion.py:108,154-160) and tqdm bars; ``utils/timer.py`` is an empty
file. Here: per-stage timers (utils.timing.StageTimer) plus an optional
XLA-level trace via ``jax.profiler`` — set ``profile_dir`` in any config (or
F4L_PROFILE_DIR in the env) and each pipeline run writes a TensorBoard-
loadable trace of device compute, transfers and compiles.
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["maybe_trace", "annotate"]


@contextlib.contextmanager
def maybe_trace(profile_dir: str | None = None):
    """Trace the enclosed block with jax.profiler when a directory is
    configured; no-op otherwise."""
    profile_dir = profile_dir or os.environ.get("F4L_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield


def annotate(name: str):
    """Named sub-span inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
