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
        from dorado_tpu.utils.torchscript import load_torchscript

        m = load_torchscript(tmp_path / "w.tensor")
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


class TestReferenceSerializedLayout:
    """Weight-layout round-trip with INDEPENDENT serialization: the .tensor
    files are written by torch.jit itself (the reference's serializer,
    utils/tensor_utils.cpp load_tensors) holding torch-convention tensors in
    the crf_utils.cpp:26-91 naming scheme. load_model must reconstruct a
    parameter pytree whose forward matches the same torch weights exactly —
    so real ONT weight archives load unmodified the day they're available."""

    @staticmethod
    def _jit_save(path, arr):
        torch = pytest.importorskip("torch")

        class M(torch.nn.Module):
            def __init__(self):
                super().__init__()
                setattr(self, "0", torch.nn.Parameter(torch.from_numpy(arr)))

        from dorado_tpu.utils.torchscript import script_and_save

        script_and_save(M(), path)

    def test_fast_lstm_model(self, tmp_path):
        torch = pytest.importorskip("torch")
        from dorado_tpu.models.crf_model import lstm_crf_forward
        from tests.test_crf_model import torch_forward

        d = tmp_path / FAST
        d.mkdir()
        shutil.copy(REF_CONFIGS / FAST / "config.toml", d / "config.toml")
        cfg = load_model_config(d)

        rng = np.random.default_rng(5)

        def rnd(*shape):
            return (rng.standard_normal(shape) * 0.3).astype(np.float32)

        # torch-convention raw tensors, written by torch.jit
        raw = {}
        for i, cv in enumerate(cfg.convs):
            raw[f"{i}.conv.weight"] = rnd(cv.size, cv.insize, cv.winlen)
            raw[f"{i}.conv.bias"] = rnd(cv.size)
        H = cfg.lstm_size
        for l in range(cfg.lstm_layers):
            layer = len(cfg.convs) + l + 1
            raw[f"{layer}.rnn.weight_ih_l0"] = rnd(4 * H, H)
            raw[f"{layer}.rnn.weight_hh_l0"] = rnd(4 * H, H)
            raw[f"{layer}.rnn.bias_ih_l0"] = rnd(4 * H)
            raw[f"{layer}.rnn.bias_hh_l0"] = rnd(4 * H)
        layer = len(cfg.convs) + cfg.lstm_layers + 1
        raw[f"{layer}.linear.weight"] = rnd(cfg.outsize, H)
        if cfg.bias:
            raw[f"{layer}.linear.bias"] = rnd(cfg.outsize)
        for name, arr in raw.items():
            self._jit_save(d / f"{name}.tensor", arr)

        config, params = load_model(d)
        # conv weights: disk [Cout, Cin, K] -> ours [K, Cin, Cout]
        for i in range(len(cfg.convs)):
            np.testing.assert_array_equal(
                np.asarray(params["convs"][i]["w"]),
                raw[f"{i}.conv.weight"].transpose(2, 1, 0),
            )
        # lstm + linear tensors load verbatim (torch convention in memory)
        for l in range(cfg.lstm_layers):
            layer = len(cfg.convs) + l + 1
            np.testing.assert_array_equal(
                np.asarray(params["lstms"][l]["w_ih"]),
                raw[f"{layer}.rnn.weight_ih_l0"],
            )
        # end-to-end: forward through our model == torch primitives fed the
        # raw tensors directly
        sig = rng.standard_normal((2, 600), dtype=np.float32)
        ours = np.asarray(lstm_crf_forward(params, sig, config))
        want = torch_forward(
            {
                "convs": params["convs"],
                "lstms": params["lstms"],
                "linear1": params["linear1"],
            },
            sig,
            config,
        )
        np.testing.assert_allclose(ours, want, rtol=2e-3, atol=1e-4)

    def test_tx_naming_roundtrip(self, tmp_path):
        """Tx model dir written by torch.jit in the reference's tx naming
        (crf_utils.cpp load_tx_model_weights) loads verbatim."""
        torch = pytest.importorskip("torch")
        from dorado_tpu.models.load import load_tx_params

        sup = "dna_r10.4.1_e8.2_400bps_sup@v5.0.0"
        src = REF_CONFIGS / sup
        if not src.is_dir():
            pytest.skip("sup config fixture missing")
        d = tmp_path / sup
        d.mkdir()
        shutil.copy(src / "config.toml", d / "config.toml")
        cfg = load_model_config(d)
        rng = np.random.default_rng(6)

        def rnd(*shape):
            return rng.standard_normal(shape).astype(np.float32)

        t = cfg.tx.tx
        dmodel = t.d_model
        raw = {}
        for i, cv in enumerate(cfg.convs):
            raw[f"conv.{i}.conv.weight"] = rnd(cv.size, cv.insize, cv.winlen)
            raw[f"conv.{i}.conv.bias"] = rnd(cv.size)
        for i in range(t.depth):
            p = f"transformer_encoder.{i}"
            raw[f"{p}.self_attn.Wqkv.weight"] = rnd(3 * dmodel, dmodel)
            raw[f"{p}.self_attn.out_proj.weight"] = rnd(dmodel, dmodel)
            raw[f"{p}.self_attn.out_proj.bias"] = rnd(dmodel)
            raw[f"{p}.ff.fc1.weight"] = rnd(2 * cfg.tx.tx.dim_feedforward, dmodel)
            raw[f"{p}.ff.fc2.weight"] = rnd(dmodel, cfg.tx.tx.dim_feedforward)
            raw[f"{p}.norm1.weight"] = rnd(dmodel)
            raw[f"{p}.norm2.weight"] = rnd(dmodel)
        up = cfg.tx.upsample
        raw["upsample.linear.weight"] = rnd(up.size * up.scale_factor, up.size)
        raw["upsample.linear.bias"] = rnd(up.size * up.scale_factor)
        # crf linear: [outsize, insize]
        raw["crf.linear.weight"] = rnd(cfg.outsize, cfg.tx.crf.insize)
        for name, arr in raw.items():
            self._jit_save(d / f"{name}.tensor", arr)
        params = load_tx_params(cfg)
        np.testing.assert_array_equal(
            np.asarray(params["layers"][0]["wqkv"]),
            raw["transformer_encoder.0.self_attn.Wqkv.weight"],
        )
        np.testing.assert_array_equal(
            np.asarray(params["convs"][0]["w"]),
            raw["conv.0.conv.weight"].transpose(2, 1, 0),
        )
        np.testing.assert_array_equal(
            np.asarray(params["crf"]["w"]), raw["crf.linear.weight"]
        )
