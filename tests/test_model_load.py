"""Tests for .tensor archives and model-directory weight loading.

Fixture model dirs are fabricated by saving random parameter pytrees in the
reference's on-disk layout (dorado/basecall/crf_utils.cpp:26-91) next to a
real config.toml copied from the reference's checked-in model configs.
"""

import shutil
from pathlib import Path

import jax
import numpy as np
import pytest

from dorado_tpu.config import load_model_config
from dorado_tpu.io.tensor_file import load_tensor, load_tensor_file, save_tensor_file
from dorado_tpu.models.crf_model import init_lstm_crf_params, lstm_crf_forward
from dorado_tpu.models.load import load_lstm_params, load_model, save_lstm_params

REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
HAC = "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"
FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"


class TestTensorFile:
    def test_reference_fixture(self):
        t = load_tensor("/root/reference/tests/data/rna_split/signal.tensor")
        assert t.dtype == np.int16
        assert t.shape == (10494,)

    def test_roundtrip_multi(self, tmp_path):
        ts = [
            np.random.randn(7, 3, 5).astype(np.float32),
            np.arange(10, dtype=np.int16),
            np.random.randn(4, 4).astype(np.float16),
            np.float32(3.5),
        ]
        save_tensor_file(tmp_path / "x.tensor", ts)
        back = load_tensor_file(tmp_path / "x.tensor")
        assert len(back) == 4
        for a, b in zip(ts, back):
            assert np.array_equal(np.asarray(a), b)

    def test_torch_can_read_ours(self, tmp_path):
        torch = pytest.importorskip("torch")
        t = np.random.randn(16, 8).astype(np.float32)
        save_tensor_file(tmp_path / "w.tensor", [t])
        m = torch.jit.load(str(tmp_path / "w.tensor"))
        got = dict(m.named_parameters())["0"].detach().numpy()
        assert np.array_equal(t, got)


@pytest.fixture(scope="module")
def hac_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model") / HAC
    d.mkdir()
    shutil.copy(REF_CONFIGS / HAC / "config.toml", d / "config.toml")
    config = load_model_config(d)
    params = init_lstm_crf_params(config, jax.random.PRNGKey(0))
    save_lstm_params(config, params, d)
    return d, params


class TestModelDirLoad:
    def test_roundtrip(self, hac_model_dir):
        d, params = hac_model_dir
        config = load_model_config(d)
        loaded = load_lstm_params(config)
        ref_leaves = jax.tree_util.tree_leaves(params)
        got_leaves = jax.tree_util.tree_leaves(loaded)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0)

    def test_forward_matches(self, hac_model_dir):
        d, params = hac_model_dir
        config, loaded = load_model(d)
        sig = np.random.randn(2, 1200).astype(np.float32)
        a = lstm_crf_forward(params, sig, config)
        loaded = jax.tree_util.tree_map(lambda x: np.asarray(x), loaded)
        b = lstm_crf_forward(loaded, sig, config)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_expected_files(self, hac_model_dir):
        d, _ = hac_model_dir
        names = sorted(p.name for p in d.glob("*.tensor"))
        # 2 convs-files x3 convs + 4 lstm-files x5 layers + linear weight (no
        # bias: hac config has bias=false)
        assert len(names) == 3 * 2 + 5 * 4 + 1
        assert "4.rnn.weight_ih_l0.tensor" in names
        assert "9.linear.weight.tensor" in names
