"""Transformer (sup) model tests: torch parity + structural invariants.

The torch mirror reimplements the reference semantics
(dorado/nn/TxModules.cpp: RotaryEmbeddingImpl::forward,
MultiHeadAttentionImpl::forward, GatedMLPImpl::forward,
TxEncoderImpl::forward deepnorm, nn/RMSNorm.cpp, nn/LinearUpsample.cpp,
LinearScaledCRF) so the JAX implementation is checked against an
independently-written executable spec.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dorado_tpu.models.presets import sup_v50_config
from dorado_tpu.models.tx_model import (
    apply_rope,
    init_tx_params,
    rms_norm,
    rope_tables,
    tx_forward,
    windowed_attention,
)


def small_sup_config():
    cfg = sup_v50_config()
    cfg.tx.tx.depth = 2
    cfg.tx.tx.d_model = 64
    cfg.tx.tx.nhead = 4
    cfg.tx.tx.dim_feedforward = 128
    cfg.tx.tx.attn_window = (5, 6)
    cfg.tx.crf.insize = 64
    cfg.convs[-1].size = 64
    cfg.convs[2].insize = 64
    cfg.convs[1].size = 64
    cfg.convs[2] = type(cfg.convs[2])(64, 64, 9, 3, cfg.convs[2].activation)
    cfg.convs[3] = type(cfg.convs[3])(64, 64, 9, 2, cfg.convs[3].activation)
    cfg.convs[4] = type(cfg.convs[4])(64, 64, 5, 2, cfg.convs[4].activation)
    return cfg


def torch_tx_reference(params, signal, cfg):
    """Reference-forward in torch (formulas transcribed from TxModules.cpp)."""
    tx = cfg.tx.tx
    x = torch.from_numpy(np.asarray(signal))[:, :, None]

    # conv stack (NHC -> torch conv1d NCW)
    x = x.permute(0, 2, 1)
    for cv, p in zip(cfg.convs, params["convs"]):
        w = torch.from_numpy(np.asarray(p["w"])).permute(2, 1, 0).contiguous()
        b = torch.from_numpy(np.asarray(p["b"]))
        x = torch.nn.functional.conv1d(x, w, b, stride=cv.stride, padding=cv.padding)
        x = torch.nn.functional.silu(x)
    x = x.permute(0, 2, 1)  # [N, T, C]

    n, t, c = x.shape
    nhead = tx.nhead
    d = c // nhead
    # RoPE tables
    inv_freq = 1.0 / (tx.theta ** (torch.arange(0, d, 2).double() / d))
    freqs = torch.arange(t).double()[:, None] * inv_freq[None, :]
    cos = torch.cos(freqs).float()
    sin = torch.sin(freqs).float()

    win_upper, win_lower = tx.attn_window
    idx = torch.arange(t)
    mask = ((idx[None, :] - idx[:, None]) >= -win_upper) & (
        (idx[None, :] - idx[:, None]) <= win_lower
    )
    # reference MEA split loop (TxModules.cpp:259-286): keys are truncated to
    # [qb - win_lower, qe + win_upper) per strip, band mask applied inside
    num_splits = 12
    elems = -(-(-(-t // num_splits)) // 4) * 4  # pad_to(div_round_up(t, 12), 4)

    for p in params["layers"]:
        wqkv = torch.from_numpy(np.asarray(p["wqkv"]))
        qkv = (x @ wqkv.T).view(n, t, 3, nhead, d)

        def rope(y):
            ev, od = y[..., : d // 2], y[..., d // 2 :]
            cc = cos[None, :, None, :]
            ss = sin[None, :, None, :]
            return torch.cat([cc * ev - ss * od, ss * ev + cc * od], dim=-1)

        q = rope(qkv[:, :, 0]).permute(0, 2, 1, 3)
        k = rope(qkv[:, :, 1]).permute(0, 2, 1, 3)
        v = qkv[:, :, 2].permute(0, 2, 1, 3)
        attn = torch.empty_like(q)
        for i in range(num_splits):
            qb = i * elems
            if qb >= t:
                break
            qe = min(t, qb + elems)
            kvb = max(0, qb - win_lower)
            kve = min(t, qe + win_upper)
            attn[:, :, qb:qe] = torch.nn.functional.scaled_dot_product_attention(
                q[:, :, qb:qe], k[:, :, kvb:kve], v[:, :, kvb:kve],
                mask[qb:qe, kvb:kve],
            )
        attn = attn.permute(0, 2, 1, 3).reshape(n, t, c)
        attn = attn @ torch.from_numpy(np.asarray(p["out_proj_w"])).T + torch.from_numpy(
            np.asarray(p["out_proj_b"])
        )
        x = attn + x * tx.deepnorm_alpha
        x = x * torch.rsqrt(x.square().mean(-1, keepdim=True) + 1e-5)
        x = x * torch.from_numpy(np.asarray(p["norm1"]))

        ff = x @ torch.from_numpy(np.asarray(p["fc1"])).T
        y, gate = ff.chunk(2, dim=-1)
        tact = torch.nn.functional.silu(gate) * y
        f = tact @ torch.from_numpy(np.asarray(p["fc2"])).T
        x = f + x * tx.deepnorm_alpha
        x = x * torch.rsqrt(x.square().mean(-1, keepdim=True) + 1e-5)
        x = x * torch.from_numpy(np.asarray(p["norm2"]))

    ups_w = torch.from_numpy(np.asarray(params["upsample"]["w"]))
    ups_b = torch.from_numpy(np.asarray(params["upsample"]["b"]))
    x = (x @ ups_w.T + ups_b).reshape(n, cfg.tx.upsample.scale_factor * t, c)

    crf_w = torch.from_numpy(np.asarray(params["crf"]["w"])) * cfg.tx.crf.scale
    return (x @ crf_w.T).numpy()


class TestTxModel:
    def test_torch_parity(self):
        cfg = small_sup_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(0))
        sig = np.random.RandomState(0).randn(2, 480).astype(np.float32)
        ours = np.asarray(tx_forward(params, jnp.asarray(sig), cfg))
        ref = torch_tx_reference(params, sig, cfg)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_output_shape(self):
        cfg = small_sup_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(1))
        sig = np.random.RandomState(1).randn(1, 480).astype(np.float32)
        out = tx_forward(params, jnp.asarray(sig), cfg)
        # stride 6 after upsample (12 conv / 2 upsample)
        assert out.shape == (1, 480 // cfg.stride, cfg.tx.crf.outsize)


class TestWindowedAttention:
    def test_single_split_matches_full_masked(self):
        """With one split there is no strip truncation: exact banded SDPA."""
        rng = np.random.RandomState(0)
        n, t, h, d = 2, 48, 2, 8
        q = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
        v = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
        win_upper, win_lower = 5, 6
        got = windowed_attention(q, k, v, win_upper, win_lower, num_splits=1)

        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(d)
        idx = np.arange(t)
        band = ((idx[None, :] - idx[:, None]) >= -win_upper) & (
            (idx[None, :] - idx[:, None]) <= win_lower
        )
        logits = jnp.where(jnp.asarray(band)[None, None], logits, -1e30)
        want = jnp.einsum("nhqk,nkhd->nqhd", jax.nn.softmax(logits, axis=-1), v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_splits_close_to_full(self):
        """Strip truncation only drops band edges at strip boundaries: the
        multi-split result stays close to exact banded attention."""
        rng = np.random.RandomState(1)
        n, t, h, d = 1, 96, 2, 8
        q = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32)) * 0.3
        k = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32)) * 0.3
        v = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
        full = windowed_attention(q, k, v, 15, 16, num_splits=1)
        split = windowed_attention(q, k, v, 15, 16, num_splits=6)
        err = np.abs(np.asarray(full) - np.asarray(split)).max()
        assert err < 0.5  # approximation, not equality


class TestRope:
    def test_rotation_preserves_norm(self):
        cos, sin = rope_tables(16, 8, 10000.0)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 2, 8).astype(np.float32))
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(y), axis=-1),
            atol=1e-5,
        )

    def test_position_zero_identity(self):
        cos, sin = rope_tables(4, 8, 10000.0)
        x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 1, 8).astype(np.float32))
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(np.asarray(y)[0, 0], np.asarray(x)[0, 0], atol=1e-6)


def test_rms_norm():
    x = jnp.asarray(np.random.RandomState(0).randn(3, 5, 8).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1).rand(8).astype(np.float32))
    got = np.asarray(rms_norm(x, w))
    xf = np.asarray(x)
    want = xf * (1.0 / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-5)) * np.asarray(w)
    np.testing.assert_allclose(got, want, atol=1e-5)


class TestQuantizedTx:
    """W8A8 opt-in path: per-channel int8 weights + dynamic per-token
    activation scales for the encoder's three fat matmuls."""

    def test_int8_matches_fp_within_quant_tolerance(self):
        import jax

        from dorado_tpu.models.presets import sup_v50_config
        from dorado_tpu.models.tx_model import (
            init_tx_params,
            quantize_tx_params,
            tx_forward,
        )

        config = sup_v50_config()
        config.tx.tx.depth = 2  # keep the CPU test fast
        params = init_tx_params(config, jax.random.PRNGKey(0))
        qparams = quantize_tx_params(params)
        sig = jax.random.normal(jax.random.PRNGKey(1), (1, 1536))
        ref = np.asarray(tx_forward(params, sig, config))
        got = np.asarray(tx_forward(qparams, sig, config))
        # int8 quantisation error: compare in relative Frobenius terms
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel
        # and the argmax transition (what the decoder consumes) mostly agrees
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.95, agree


class TestFusedNorm:
    """ops/fused_norm.py must reproduce the unfused
    (matmul + bias).astype(dtype) + alpha*res -> rms_norm sequence."""

    @pytest.mark.parametrize("has_bias,o,k", [(True, 512, 512), (False, 512, 2048)])
    def test_matches_unfused(self, has_bias, o, k):
        import jax

        from dorado_tpu.models.tx_model import rms_norm
        from dorado_tpu.ops.fused_norm import matmul_residual_rmsnorm

        n, t = 2, 300
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, t, k), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (o, k), jnp.float32) / np.sqrt(k)
        b = jax.random.normal(jax.random.PRNGKey(2), (o,), jnp.float32) if has_bias else None
        res = jax.random.normal(jax.random.PRNGKey(3), (n, t, o), jnp.float32)
        nw = jax.random.normal(jax.random.PRNGKey(4), (o,), jnp.float32)
        alpha = 2.4494897

        mm = jnp.einsum("ntk,ok->nto", x, w)
        if has_bias:
            mm = mm + b
        ref = rms_norm(mm.astype(x.dtype) + res * alpha, nw)
        got = matmul_residual_rmsnorm(x, w, b, res, nw, alpha, interpret=True)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5
        )
