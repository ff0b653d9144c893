"""Process-level JAX setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (repeat runs skip compiles)."""
    import jax

    cache_dir = os.environ.get(
        "DORADO_TPU_CACHE_DIR", os.path.expanduser("~/.cache/dorado_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
