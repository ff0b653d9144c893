"""Profiling scopes (parity: dorado/torch_utils/gpu_profiling.h
ScopedProfileRange NVTX ranges + timing printouts).

On TPU, ranges map to `jax.profiler.TraceAnnotation` so they show up in the
XLA profiler timeline; with DORADO_TPU_PROFILE_LEVEL set, wall-clock timings
print to stderr like the reference's cuda_profile_level dev option.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_LEVEL = int(os.environ.get("DORADO_TPU_PROFILE_LEVEL", "0"))


def profile_level() -> int:
    return _LEVEL


@contextlib.contextmanager
def scoped_profile_range(name: str, level: int = 1):
    """Annotate a host-side region; nests in the jax profiler trace."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # profiler unavailable (e.g. partial installs)
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter() if _LEVEL >= level else None
    with ctx:
        yield
    if t0 is not None:
        dt = (time.perf_counter() - t0) * 1e3
        print(f"[prof] {name}: {dt:.2f} ms", file=sys.stderr)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a full device trace (use: --profile-dir on the CLI)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
