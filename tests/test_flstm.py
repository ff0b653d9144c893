"""Factorised-LSTM layer parity against a torch transcription of
dorado/nn/FLSTMStack.cpp forward_cublas (down-project input+hidden to K,
up-project the concatenation to the 4C gates, bias = up_bias_ih)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dorado_tpu.models.crf_model import flstm_layer, lstm_stack


def _params(rng, c, k):
    return {
        "dn_w_ih": rng.randn(k, c).astype(np.float32) * 0.3,
        "dn_w_hh": rng.randn(k, c).astype(np.float32) * 0.3,
        "up_w_ih": rng.randn(4 * c, k).astype(np.float32) * 0.3,
        "up_w_hh": rng.randn(4 * c, k).astype(np.float32) * 0.3,
        "up_b_ih": rng.randn(4 * c).astype(np.float32) * 0.1,
        "up_b_hh": rng.randn(4 * c).astype(np.float32) * 0.1,
    }


def _torch_flstm(p, x, reverse):
    x = torch.from_numpy(np.asarray(x))
    if reverse:
        x = x.flip(1)
    n, t, c = x.shape
    dn_ih = torch.from_numpy(p["dn_w_ih"])
    dn_hh = torch.from_numpy(p["dn_w_hh"])
    up = torch.cat(
        [torch.from_numpy(p["up_w_ih"]), torch.from_numpy(p["up_w_hh"])], dim=1
    )
    bias = torch.from_numpy(p["up_b_ih"])
    h = torch.zeros(n, c)
    cc = torch.zeros(n, c)
    outs = []
    for step in range(t):
        x_dn = x[:, step] @ dn_ih.T
        h_dn = h @ dn_hh.T
        gates = torch.cat([x_dn, h_dn], dim=1) @ up.T + bias
        i, f, g, o = gates.chunk(4, dim=1)
        cc = torch.sigmoid(f) * cc + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(cc)
        outs.append(h)
    out = torch.stack(outs, dim=1)
    if reverse:
        out = out.flip(1)
    return out.numpy()


@pytest.mark.parametrize("reverse", [False, True])
def test_flstm_layer_parity(reverse):
    rng = np.random.RandomState(0)
    c, k = 32, 8
    p = _params(rng, c, k)
    x = rng.randn(3, 20, c).astype(np.float32)
    got = np.asarray(flstm_layer({kk: jnp.asarray(v) for kk, v in p.items()}, jnp.asarray(x), reverse))
    want = _torch_flstm(p, x, reverse)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stack_dispatches_flstm():
    rng = np.random.RandomState(1)
    c, k = 16, 4
    params = {"lstms": [_params(rng, c, k) for _ in range(3)]}
    x = jnp.asarray(rng.randn(2, 12, c).astype(np.float32))
    out = lstm_stack(params, x, reverse_first=True)
    assert out.shape == x.shape
