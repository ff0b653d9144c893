"""Auto batch-size selection (CudaCaller.cpp:371-520 analogue)."""

import jax
import numpy as np
import pytest

from dorado_tpu.basecall.batch_size import (
    auto_batch_size,
    bytes_per_chunk_timestep,
    max_safe_batch_size,
)
from dorado_tpu.models.crf_model import init_lstm_crf_params
from dorado_tpu.models.presets import fast_v40_config, hac_v43_config


def test_memory_cap_scales():
    hac = hac_v43_config()
    fast = fast_v40_config()
    assert bytes_per_chunk_timestep(hac) > bytes_per_chunk_timestep(fast)
    n_hac = max_safe_batch_size(hac, 10000)
    n_fast = max_safe_batch_size(fast, 10000)
    assert n_hac % 64 == 0 and n_fast % 64 == 0
    assert n_fast > n_hac
    # hac at production chunk should allow the batch sizes we actually run
    assert n_hac >= 256
    # smaller memory -> smaller batch
    assert max_safe_batch_size(hac, 10000, hbm_bytes=8 * 1024**3) < n_hac


def test_auto_sweep_runs(tmp_path, monkeypatch):
    monkeypatch.setenv("DORADO_TPU_CACHE_DIR", str(tmp_path))
    cfg = fast_v40_config()
    params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
    n = auto_batch_size(cfg, params, 4000, max_batch=128)
    assert n in (64, 128)
    # second call hits the cache (same answer, no benchmarking)
    assert auto_batch_size(cfg, params, 4000, max_batch=128) == n
    assert (tmp_path / "batch_benchmarks.json").exists()
