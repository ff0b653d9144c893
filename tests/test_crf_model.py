"""Numerical parity of the JAX LSTM-CRF forward against a torch reference.

The torch model is constructed to the reference architecture
(conv stack -> alternating LSTMs -> LinearCRF [-> clamp]) and both sides share
the same weights, so outputs must agree to float32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from dorado_tpu.config import (
    Activation,
    BasecallModelConfig,
    ConvParams,
)
from dorado_tpu.models import init_lstm_crf_params, lstm_crf_forward

torch = pytest.importorskip("torch")


def small_hac_like_config(tmp_path, state_len=2, lstm_size=32, stride=3) -> BasecallModelConfig:
    cfg = BasecallModelConfig(model_path=tmp_path)
    cfg.convs = [
        ConvParams(1, 8, 5, 1, Activation.SWISH),
        ConvParams(8, 8, 5, 1, Activation.SWISH),
        ConvParams(8, lstm_size, 19, stride, Activation.TANH),
    ]
    cfg.stride = stride
    cfg.lstm_size = lstm_size
    cfg.lstm_layers = 5
    cfg.bias = False
    cfg.clamp = True
    cfg.state_len = state_len
    cfg.outsize = 4 ** (state_len + 1)
    cfg.blank_score = 2.0
    cfg.scale = 1.0
    cfg.num_features = 1
    return cfg


def torch_forward(params, signal_nt, cfg):
    """Reference forward pass built from torch primitives."""
    x = torch.from_numpy(signal_nt).float().unsqueeze(1)  # [N, 1, T]
    for cv, p in zip(cfg.convs, params["convs"]):
        w = torch.from_numpy(np.asarray(p["w"])).permute(2, 1, 0).contiguous()  # [Cout, Cin, K]
        b = torch.from_numpy(np.asarray(p["b"]))
        x = torch.nn.functional.conv1d(x, w, b, stride=cv.stride, padding=cv.padding)
        if cv.activation is Activation.SWISH:
            x = torch.nn.functional.silu(x)
        elif cv.activation is Activation.TANH:
            x = torch.tanh(x)
    x = x.permute(0, 2, 1)  # [N, T', H]

    for i, p in enumerate(params["lstms"]):
        reverse = i % 2 == 0  # reverse_first
        lstm = torch.nn.LSTM(cfg.lstm_size, cfg.lstm_size, batch_first=True)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih"])))
            lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh"])))
            lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
            lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
        if reverse:
            x = x.flip(1)
        x, _ = lstm(x)
        if reverse:
            x = x.flip(1)

    w = torch.from_numpy(np.asarray(params["linear1"]["w"]))
    scores = x @ w.T
    if "b" in params["linear1"]:
        scores = scores + torch.from_numpy(np.asarray(params["linear1"]["b"]))
    if cfg.clamp:
        scores = scores.clamp(-5.0, 5.0)
    return scores.detach().numpy()


class TestLstmCrfParity:
    def test_forward_matches_torch(self, tmp_path):
        cfg = small_hac_like_config(tmp_path)
        key = jax.random.PRNGKey(0)
        params = init_lstm_crf_params(cfg, key)

        rng = np.random.default_rng(1)
        signal = rng.standard_normal((3, 120), dtype=np.float32)

        got = np.asarray(lstm_crf_forward(params, jnp.asarray(signal), cfg))
        want = torch_forward(jax.tree.map(np.asarray, params), signal, cfg)

        assert got.shape == want.shape == (3, 120 // cfg.stride, cfg.outsize)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_output_shape_hac_dims(self, tmp_path):
        cfg = small_hac_like_config(tmp_path, state_len=3, lstm_size=64, stride=6)
        params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
        # conv insize of first layer must be updated for lstm size change
        signal = jnp.zeros((2, 996))
        scores = lstm_crf_forward(params, signal, cfg)
        assert scores.shape == (2, 166, 256)
        # clamp active
        assert float(jnp.max(jnp.abs(scores))) <= 5.0

    def test_jit_and_batch_invariance(self, tmp_path):
        cfg = small_hac_like_config(tmp_path)
        params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
        fwd = jax.jit(lambda p, s: lstm_crf_forward(p, s, cfg))
        rng = np.random.default_rng(2)
        sig = rng.standard_normal((4, 120), dtype=np.float32)
        full = np.asarray(fwd(params, jnp.asarray(sig)))
        one = np.asarray(fwd(params, jnp.asarray(sig[:1])))
        np.testing.assert_allclose(full[:1], one[:1], rtol=1e-5, atol=1e-6)
