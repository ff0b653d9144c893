"""Automatic batch-size selection.

The reference sizes batches per GPU from available memory plus a benchmark
sweep at 288*stride-sample chunks, cached per (device, model)
(CudaCaller::determine_batch_dims, CudaCaller.cpp:371-520 +
benchmarks/CudaChunkBenchmarks). The TPU equivalent:

  - an analytic per-(chunk, timestep) activation estimate caps the batch to
    what fits HBM (calculate_memory_requirements analogue);
  - `-b 0` sweeps batch sizes at the same 288*stride benchmark chunk on the
    attached chip, picks the fastest per-sample configuration, and caches
    the result in ~/.cache/dorado_tpu/batch_benchmarks.json keyed by
    (device kind, model name, chunk size).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

GB = 1024**3
BATCH_GRANULARITY = 64
DEFAULT_HBM_BYTES = 16 * GB  # v5e
MEMORY_LIMIT_FRACTION = 0.85


def bytes_per_chunk_timestep(config, compute_bytes: int = 2) -> int:
    """Dominant per-(chunk, output-timestep) activation footprint: LSTM gate
    buffers, CRF scores, decode scans and beam history, with a 1.5x slack
    for XLA temporaries."""
    insize = getattr(config, "lstm_size", 0) or getattr(config, "d_model", 0) or 512
    outsize = config.outsize
    num_states = config.num_states
    act = (
        # pre-projected gates (double-buffered) + layer activations
        2 * 4 * insize * compute_bytes
        + 4 * insize * compute_bytes
        # scores [C] f32 + fwd/bwd/posts scans [S] f32
        + outsize * 4
        + 3 * num_states * 4
        # beam history: state i32 + parent i8 + stay u8 per beam elem (32)
        + 32 * 6
    )
    return int(act * 1.5)


def max_safe_batch_size(
    config,
    chunk_size: int,
    hbm_bytes: int = DEFAULT_HBM_BYTES,
    limit_fraction: float = MEMORY_LIMIT_FRACTION,
) -> int:
    t_out = chunk_size // config.stride
    per_chunk = bytes_per_chunk_timestep(config) * t_out
    budget = int(hbm_bytes * limit_fraction) - 1 * GB  # weights + runtime slack
    n = max(budget // per_chunk, BATCH_GRANULARITY)
    return int(n - (n % BATCH_GRANULARITY))


def _cache_path() -> Path:
    return Path(
        os.environ.get("DORADO_TPU_CACHE_DIR", os.path.expanduser("~/.cache/dorado_tpu"))
    ) / "batch_benchmarks.json"


def auto_batch_size(
    config,
    params,
    chunk_size: int,
    compute_dtype=None,
    max_batch: int | None = None,
    use_cache: bool = True,
) -> int:
    """Benchmark sweep at 288*stride samples (the reference's benchmark
    chunk), doubling batch sizes up to the memory cap; returns the batch
    with the best per-sample throughput."""
    import jax
    import jax.numpy as jnp


    device_kind = jax.devices()[0].device_kind
    model_name = getattr(config, "model_name", "unknown")
    key = f"{device_kind}|{model_name}|{chunk_size}"

    cache = {}
    cp = _cache_path()
    if use_cache and cp.exists():
        try:
            cache = json.loads(cp.read_text())
        except Exception:
            cache = {}
        if key in cache:
            return int(cache[key])
    if use_cache:
        # packaged per-device tables (benchmarks/CudaChunkBenchmarks analogue)
        shipped = Path(__file__).parent / "benchmarks_v5e.json"
        try:
            table = json.loads(shipped.read_text())
            # device_kind strings vary slightly across runtimes; prefix-match
            for k, v in table.items():
                parts = k.split("|")
                if len(parts) == 3 and key.startswith(parts[0][:10]) and (
                    f"{parts[1]}|{parts[2]}" == f"{model_name}|{chunk_size}"
                ):
                    return int(v)
        except Exception:
            pass

    bench_chunk = 288 * config.stride
    cap = max_batch or min(max_safe_batch_size(config, chunk_size), 4096)
    if config.is_tx_model:
        from dorado_tpu.models.tx_model import make_tx_forward_fn as _mk
    else:
        from dorado_tpu.models.crf_model import make_crf_forward_fn as _mk
    dtype = compute_dtype or jnp.float32
    forward = _mk(config, compute_dtype=dtype)

    best = (float("inf"), BATCH_GRANULARITY)
    n = BATCH_GRANULARITY
    while n <= cap:
        sig = jnp.zeros((n, bench_chunk), dtype)
        fn = jax.jit(forward)
        try:
            out = fn(params, sig)
            _ = np.asarray(out[:1, :1, :1])  # compile + sync
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(params, sig)
            _ = np.asarray(out[:1, :1, :1])
            per_sample = (time.perf_counter() - t0) / reps / (n * bench_chunk)
        except Exception:
            break  # out of memory at this size
        if per_sample < best[0]:
            best = (per_sample, n)
        n *= 2
    chosen = best[1]

    if use_cache:
        try:
            cp.parent.mkdir(parents=True, exist_ok=True)
            cache[key] = chosen
            cp.write_text(json.dumps(cache, indent=1))
        except Exception:
            pass
    return chosen
