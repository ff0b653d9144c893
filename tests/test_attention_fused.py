"""Fused Pallas banded attention parity vs the XLA strip-loop reference
implementation (which itself is torch-parity tested in test_tx_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.models.tx_model import windowed_attention
from dorado_tpu.ops.attention import windowed_attention_fused


@pytest.mark.parametrize(
    "n,t,h,d,wu,wl",
    [
        (2, 1024, 8, 64, 127, 128),  # sup production shape
        (1, 200, 4, 64, 127, 128),  # T not a multiple of 128
        (2, 300, 2, 64, 10, 12),  # small window (strip truncation active)
        (1, 97, 2, 64, 30, 40),  # T < BQ
    ],
)
def test_fused_matches_strip_loop(n, t, h, d, wu, wl):
    rng = np.random.RandomState(t + wu)
    q = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, t, h, d).astype(np.float32))
    ref = np.asarray(windowed_attention(q, k, v, wu, wl))
    got = np.asarray(windowed_attention_fused(q, k, v, wu, wl))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_window_too_large_rejected():
    q = jnp.zeros((1, 300, 2, 64))
    with pytest.raises(ValueError):
        windowed_attention_fused(q, q, q, 300, 300)


@pytest.mark.parametrize(
    "n,t,h,d,wu,wl",
    [
        (2, 1024, 8, 64, 127, 128),  # sup production shape
        (1, 300, 4, 64, 127, 128),  # T not a multiple of BQ
        (1, 97, 2, 64, 30, 40),  # T < BQ
    ],
)
def test_qkv_rope_fused_matches_reference_path(n, t, h, d, wu, wl):
    """The fully fused kernel (raw qkv in, RoPE in VMEM) matches the
    explicit rope + strip-loop reference path."""
    from dorado_tpu.models.tx_model import apply_rope, rope_tables
    from dorado_tpu.ops.attention import windowed_attention_qkv_rope

    rng = np.random.RandomState(t + h)
    qkv = jnp.asarray(rng.randn(n, t, 3 * h * d).astype(np.float32))
    cos, sin = rope_tables(t, d, 10000.0)
    q4 = qkv.reshape(n, t, 3, h, d)
    q = apply_rope(q4[:, :, 0], cos, sin)
    k = apply_rope(q4[:, :, 1], cos, sin)
    v = q4[:, :, 2]
    ref = np.asarray(windowed_attention(q, k, v, wu, wl)).reshape(n, t, h * d)
    got = np.asarray(windowed_attention_qkv_rope(qkv, cos, sin, h, wu, wl))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize(
    "n,t,h,d,wu,wl",
    [
        (2, 1024, 8, 64, 127, 128),  # sup production shape
        (1, 300, 4, 64, 127, 128),  # T not a multiple of BQ
        (1, 97, 2, 64, 30, 40),  # T < BQ
    ],
)
def test_ext_path_matches_reference(n, t, h, d, wu, wl):
    """The extended-wqkv path (swap baked into weight rows + full-width FMA
    rope + banded kernel) matches the explicit rope + strip-loop path."""
    from dorado_tpu.models.tx_model import apply_rope, rope_ext_tables, rope_tables
    from dorado_tpu.ops.attention import windowed_attention_ext

    rng = np.random.RandomState(3 * t + h)
    hd = h * d
    x = jnp.asarray(rng.randn(n, t, 128).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(3 * hd, 128).astype(np.float32) * 0.1)
    qkv = jnp.einsum("ntc,gc->ntg", x, wqkv)
    cos, sin = rope_tables(t, d, 10000.0)
    q4 = qkv.reshape(n, t, 3, h, d)
    q = apply_rope(q4[:, :, 0], cos, sin)
    k = apply_rope(q4[:, :, 1], cos, sin)
    v = q4[:, :, 2]
    ref = np.asarray(windowed_attention(q, k, v, wu, wl)).reshape(n, t, hd)

    ct, st, perm = rope_ext_tables(t, d, h, 10000.0)
    wext = jnp.concatenate([wqkv, wqkv[perm]], axis=0)
    qkv_ext = jnp.einsum("ntc,gc->ntg", x, wext)
    got = np.asarray(windowed_attention_ext(qkv_ext, ct, st, h, wu, wl))
    np.testing.assert_allclose(got, ref, atol=2e-5)


class TestHalfpermAttention:
    """windowed_attention_halfperm: RoPE inside the kernel over halves-major
    q/k rows (A/B variant of the ext path; kept for toolchains where the
    in-kernel rotate is cheap)."""

    def test_matches_strip_loop_reference(self):
        import numpy as np

        from dorado_tpu.models import tx_model as T
        from dorado_tpu.ops.attention import (
            rope_half_tables,
            rope_halfperm,
            windowed_attention_halfperm,
        )

        n, t_len, nhead, d = 2, 512, 8, 64
        hd = nhead * d
        x = jax.random.normal(jax.random.PRNGKey(0), (n, t_len, hd), jnp.float32)
        wqkv = jax.random.normal(
            jax.random.PRNGKey(1), (3 * hd, hd), jnp.float32
        ) / np.sqrt(hd)

        qkv = jnp.einsum("ntc,gc->ntg", x, wqkv)
        qkv4 = qkv.reshape(n, t_len, 3, nhead, d)
        cos, sin = T.rope_tables(t_len, d, 10000.0)
        q = T.apply_rope(qkv4[:, :, 0], cos, sin)
        k = T.apply_rope(qkv4[:, :, 1], cos, sin)
        v = qkv4[:, :, 2]
        ref = T.windowed_attention(q, k, v, 127, 128).reshape(n, t_len, hd)

        hp = rope_halfperm(nhead, d)
        rows = np.concatenate([hp, hd + hp, 2 * hd + np.arange(hd)])
        qkv_hp = jnp.einsum("ntc,gc->ntg", x, wqkv[rows])
        tabs = rope_half_tables(t_len, d, nhead, 10000.0)
        got = windowed_attention_halfperm(
            qkv_hp, tabs, nhead, 127, 128, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-4
        )


class TestExtFusedRope:
    """windowed_attention_ext_fused must equal windowed_attention_ext (it
    is the same kernel with the RoPE FMA moved inside)."""

    def test_matches_ext(self):
        from dorado_tpu.models import tx_model as T
        from dorado_tpu.ops.attention import (
            windowed_attention_ext,
            windowed_attention_ext_fused,
        )

        n, t_len, nhead, d = 2, 512, 8, 64
        hd = nhead * d
        x = jax.random.normal(jax.random.PRNGKey(0), (n, t_len, hd), jnp.float32)
        wqkv = jax.random.normal(
            jax.random.PRNGKey(1), (3 * hd, hd), jnp.float32
        ) / np.sqrt(hd)
        ct, st, perm = T.rope_ext_tables(t_len, d, nhead, 10000.0)
        w_ext = jnp.concatenate([wqkv, wqkv[perm]], axis=0)
        qkv_ext = jnp.einsum("ntc,gc->ntg", x, w_ext)
        ref = windowed_attention_ext(
            qkv_ext, ct, st, nhead, 127, 128, interpret=True
        )
        got = windowed_attention_ext_fused(
            qkv_ext, jnp.stack([ct, st]), nhead, 127, 128, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5
        )
