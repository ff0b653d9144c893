"""Developer option flags.

Reproduces utils/dev_utils.h `get_dev_opt<T>`: undocumented tuning knobs
settable via `--devopts k=v[;k=v...]` on any subcommand or the
DORADO_TPU_DEVOPTS environment variable (the reference also reads env-style
overrides, e.g. DORADO_EXTRA_CHUNK_SIZES, CudaCaller.cpp:400).
"""

from __future__ import annotations

import os

_opts: dict[str, str] = {}


def set_dev_opts(spec: str) -> None:
    """Parse "k=v;k2=v2" (also accepts ',' separators)."""
    for part in spec.replace(",", ";").split(";"):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad devopt {part!r}: expected k=v")
        k, v = part.split("=", 1)
        _opts[k.strip()] = v.strip()


def get_dev_opt(name: str, default):
    """Typed lookup: the default's type drives the conversion."""
    value = _opts.get(name)
    if value is None:
        env = os.environ.get("DORADO_TPU_DEVOPTS", "")
        if env and not _opts:
            set_dev_opts(env)
            value = _opts.get(name)
    if value is None:
        return default
    if isinstance(default, bool):
        return value.lower() in ("1", "true", "yes", "on")
    return type(default)(value)
