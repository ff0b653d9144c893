"""Transformer-model pipeline integration: POD5 -> sup-small engine -> records,
plus tx model-dir weight save/load roundtrip."""

from pathlib import Path

import jax
import numpy as np
import pytest

from dorado_tpu.models.load import load_tx_params, save_tx_params
from dorado_tpu.models.tx_model import init_tx_params, tx_forward
from dorado_tpu.pipeline.basecaller import BasecallerPipeline

from tests.test_tx_model import small_sup_config

POD5_DIR = Path("/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz")


class CollectWriter:
    def __init__(self):
        self.records = []

    def write(self, rec):
        self.records.append(rec)


class TestTxPipeline:
    def test_end_to_end_viterbi(self):
        cfg = small_sup_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(0))
        pipeline = BasecallerPipeline(
            cfg,
            params,
            chunk_size=1920,  # multiple of chunk_size_granularity 192
            batch_size=4,
            overlap=192,
            decoder="viterbi",
            emit_moves=True,
        )
        writer = CollectWriter()
        stats = pipeline.run(POD5_DIR, writer)
        assert stats.reads_called == 3
        for rec in writer.records:
            assert len(rec.seq) == len(rec.qual)
            mv = next(t for t in rec.tags if t.tag == "mv")
            assert mv.value[0] == cfg.stride
            assert sum(int(v) for v in mv.value[1:]) == len(rec.seq)


class TestTxWeightRoundtrip:
    def test_save_load(self, tmp_path):
        cfg = small_sup_config()
        cfg.model_path = tmp_path / "sup_small"
        params = init_tx_params(cfg, jax.random.PRNGKey(1))
        save_tx_params(cfg, params, cfg.model_path)
        loaded = load_tx_params(cfg)
        ref = jax.tree_util.tree_leaves(params)
        got = jax.tree_util.tree_leaves(loaded)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_forward_after_reload(self, tmp_path):
        cfg = small_sup_config()
        cfg.model_path = tmp_path / "sup_small"
        params = init_tx_params(cfg, jax.random.PRNGKey(2))
        save_tx_params(cfg, params, cfg.model_path)
        loaded = jax.tree_util.tree_map(np.asarray, load_tx_params(cfg))
        sig = np.random.RandomState(0).randn(1, 384).astype(np.float32)
        a = np.asarray(tx_forward(params, sig, cfg))
        b = np.asarray(tx_forward(loaded, sig, cfg))
        np.testing.assert_allclose(a, b, atol=1e-6)
