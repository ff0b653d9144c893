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
