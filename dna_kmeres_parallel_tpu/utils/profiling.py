"""Profiler integration.

Replaces the reference's manual cudaEvent timers (SURVEY.md §5) with JAX's
native tracing: xplane traces viewable in TensorBoard/XProf, plus
block-until-ready wall timing helpers for quick numbers.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Expose the live profiling server (connect with TensorBoard capture)."""
    import jax

    return jax.profiler.start_server(port)


@contextlib.contextmanager
def wall_timer(out: dict, key: str):
    """Device-synchronized wall timer: blocks on all live arrays passed via
    out[key + '_arrays'] before reading the clock."""
    import jax

    t0 = time.perf_counter()
    yield
    arrays = out.pop(key + "_arrays", None)
    if arrays is not None:
        jax.block_until_ready(arrays)
    out[key] = time.perf_counter() - t0
