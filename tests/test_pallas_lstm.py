"""int8 quantised Pallas LSTM parity (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np


def test_int8_quantized_matches_f32():
    from dorado_tpu.ops.lstm import (
        lstm_scan_time_major,
        lstm_scan_time_major_int8,
        quantize_lstm_weights,
    )

    rng = np.random.RandomState(3)
    T, N, H = 48, 8, 96
    xp = jnp.asarray(rng.randn(T, N, 4 * H).astype(np.float32) * 0.5)
    whh = jnp.asarray((rng.randn(H, 4 * H) * 0.1).astype(np.float32))
    ref = np.asarray(lstm_scan_time_major(xp, whh))
    w8, sc = quantize_lstm_weights(whh)
    got = np.asarray(lstm_scan_time_major_int8(xp, w8, sc))
    assert np.abs(got - ref).max() < 0.02
    # reversed direction too
    ref_r = np.asarray(lstm_scan_time_major(xp, whh, reverse=True))
    got_r = np.asarray(lstm_scan_time_major_int8(xp, w8, sc, reverse=True))
    assert np.abs(got_r - ref_r).max() < 0.02


def test_wide_lstm_block_sizing_and_parity():
    """H=768 (LSTM-sup class) must shrink the batch tile under the VMEM
    budget (block_n=128 overflowed and failed the v5e backend compile) and
    still produce the exact scan result."""
    import jax
    import jax.numpy as jnp

    from dorado_tpu.ops.lstm import lstm_scan_time_major

    t_len, n, h = 16, 128, 768
    xproj = jax.random.normal(jax.random.PRNGKey(0), (t_len, n, 4 * h), jnp.float32)
    whh_t = jax.random.normal(jax.random.PRNGKey(1), (h, 4 * h), jnp.float32) * 0.1

    got = lstm_scan_time_major(xproj, whh_t, interpret=True)

    # reference scan
    def step(carry, xp):
        hs, cs = carry
        gates = xp + hs @ whh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * cs + jax.nn.sigmoid(i) * jnp.tanh(g)
        hn = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (hn, c), hn

    init = (jnp.zeros((n, h)), jnp.zeros((n, h)))
    _, ref = jax.lax.scan(step, init, xproj)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)
