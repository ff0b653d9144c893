"""W8A8 int8 MXU matmul kernels (ops/int8_matmul.py).

The TPU analogue of the reference's quantised Koi Tx tiles
(dorado/nn/TxModules.h:95-117). On CPU these exercise the XLA fallback
path (identical quantisation semantics to the Mosaic kernels) plus the
Pallas kernels in interpret mode, so the kernel bodies are validated
without a TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.ops.int8_matmul import (
    quantize_rows,
    quantize_weight,
    swiglu_w8a8,
    w8a8_matmul,
    w8a8_matmul_fq,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(42)


class TestQuantize:
    def test_weight_roundtrip(self, rng):
        w = rng.randn(64, 32).astype(np.float32)
        wq_t, ws = quantize_weight(w)
        assert wq_t.shape == (32, 64) and wq_t.dtype == jnp.int8
        assert ws.shape == (1, 64)
        back = np.asarray(wq_t, np.float32) * np.asarray(ws)
        assert np.abs(back - w.T).max() <= np.abs(w).max() / 127.0 + 1e-6

    def test_rows_roundtrip(self, rng):
        x = rng.randn(8, 5, 32).astype(np.float32)
        xq, xs = quantize_rows(jnp.asarray(x))
        assert xq.shape == x.shape and xq.dtype == jnp.int8
        assert xs.shape == (8, 5, 1)
        back = np.asarray(xq, np.float32) * np.asarray(xs)
        amax = np.abs(x).max(axis=-1, keepdims=True)
        assert np.abs(back - x).max() <= (amax / 127.0 + 1e-6).max()


class TestMatmul:
    def _setup(self, rng, m=48, k=32, o=64):
        x = rng.randn(m, k).astype(np.float32)
        w = rng.randn(o, k).astype(np.float32)
        wq_t, ws = quantize_weight(w)
        return jnp.asarray(x), w, wq_t, ws

    def test_a8_matches_f32(self, rng):
        x, w, wq_t, ws = self._setup(rng)
        xq, xs = quantize_rows(x)
        got = np.asarray(
            w8a8_matmul(xq, xs, wq_t, ws, out_dtype=jnp.float32)
        )
        want = np.asarray(x) @ w.T
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.02, rel

    def test_fq_matches_a8(self, rng):
        x, w, wq_t, ws = self._setup(rng)
        xq, xs = quantize_rows(x)
        a8 = np.asarray(w8a8_matmul(xq, xs, wq_t, ws, out_dtype=jnp.float32))
        fq = np.asarray(w8a8_matmul_fq(x, wq_t, ws, out_dtype=jnp.float32))
        np.testing.assert_allclose(fq, a8, rtol=1e-5, atol=1e-5)

    def test_batched_leading_dims(self, rng):
        x = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
        w = rng.randn(64, 32).astype(np.float32)
        wq_t, ws = quantize_weight(w)
        out = w8a8_matmul_fq(x, wq_t, ws, out_dtype=jnp.float32)
        assert out.shape == (2, 7, 64)
        flat = w8a8_matmul_fq(x.reshape(14, 32), wq_t, ws, out_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out).reshape(14, 64), np.asarray(flat), rtol=1e-6
        )

    @pytest.mark.skipif(
        jax.default_backend() == "tpu", reason="interpret mode is a CPU check"
    )
    def test_interpret_kernel_matches_fallback(self, rng):
        # interpret=True runs the actual Mosaic kernel bodies
        x, w, wq_t, ws = self._setup(rng, m=16, k=128, o=128)
        xq, xs = quantize_rows(x)
        ref = np.asarray(w8a8_matmul(xq, xs, wq_t, ws, out_dtype=jnp.float32))
        got = np.asarray(
            w8a8_matmul(
                xq, xs, wq_t, ws, block_m=8, block_n=128,
                out_dtype=jnp.float32, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        ref = np.asarray(w8a8_matmul_fq(x, wq_t, ws, out_dtype=jnp.float32))
        got = np.asarray(
            w8a8_matmul_fq(
                x, wq_t, ws, block_m=8, block_n=128,
                out_dtype=jnp.float32, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_row_padding(self, rng):
        # m=5 not divisible by any block: wrapper pads and slices back
        x, w, wq_t, ws = self._setup(rng, m=5)
        out = w8a8_matmul_fq(x, wq_t, ws, out_dtype=jnp.float32)
        want = np.asarray(x) @ w.T
        rel = np.linalg.norm(np.asarray(out) - want) / np.linalg.norm(want)
        assert rel < 0.02


class TestSwiGLU:
    def test_matches_reference_swiglu(self, rng):
        m, k, f = 24, 32, 48
        x = rng.randn(m, k).astype(np.float32)
        wy = rng.randn(f, k).astype(np.float32)
        wg = rng.randn(f, k).astype(np.float32)
        wy_t, wys = quantize_weight(wy)
        wg_t, wgs = quantize_weight(wg)
        xq, xs = quantize_rows(jnp.asarray(x))
        tq, ts = swiglu_w8a8(xq, xs, wy_t, wys, wg_t, wgs)
        got = np.asarray(tq, np.float32) * np.asarray(ts)

        y = x @ wy.T
        g = x @ wg.T
        want = y * (g / (1.0 + np.exp(-g)))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.03, rel
        # output is requantised per row
        assert tq.dtype == jnp.int8 and ts.shape == (m, 1)

    @pytest.mark.skipif(
        jax.default_backend() == "tpu", reason="interpret mode is a CPU check"
    )
    def test_interpret_kernel_matches_fallback(self, rng):
        m, k, f = 16, 128, 128
        x = rng.randn(m, k).astype(np.float32)
        wy_t, wys = quantize_weight(rng.randn(f, k).astype(np.float32))
        wg_t, wgs = quantize_weight(rng.randn(f, k).astype(np.float32))
        xq, xs = quantize_rows(jnp.asarray(x))
        rq, rs = swiglu_w8a8(xq, xs, wy_t, wys, wg_t, wgs)
        gq, gs = swiglu_w8a8(
            xq, xs, wy_t, wys, wg_t, wgs, block_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=1e-5)
        # requant rounding at the int8 edge may differ by 1 ulp
        assert np.abs(np.asarray(gq, np.int32) - np.asarray(rq, np.int32)).max() <= 1


class TestTxW8A8:
    def test_tx_forward_parity(self):
        """Full-model check: w8a8 scores track the f32 scores closely
        (the production default on TPU; reference ships quantised Koi
        Tx tiles the same way)."""
        from dorado_tpu.models import presets
        from dorado_tpu.models.tx_model import (
            init_tx_params,
            quantize_tx_params_w8a8,
            tx_forward,
        )

        cfg = presets.sup_v50_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        params["layers"] = params["layers"][:3]
        sig = jnp.asarray(
            np.random.RandomState(1).randn(2, 1536).astype(np.float32)
        )
        ref = np.asarray(tx_forward(params, sig, cfg))
        got = np.asarray(tx_forward(quantize_tx_params_w8a8(params), sig, cfg))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert rel < 0.05, rel
        assert agree > 0.95, agree

    def test_tx_forward_parity_full_depth(self):
        """Quantisation drift at the production depth (18 layers).

        Measured: rel frobenius 3.1%, argmax agreement 94.5% on RANDOM
        weights — a worst case for agreement, since random-weight scores
        are diffuse and near-ties flip under tiny perturbations; trained
        models produce large-margin transitions (and the reference ships
        int8 Koi Tx tiles at this same precision class,
        dorado/nn/TxModules.h:95-117)."""
        from dorado_tpu.models import presets
        from dorado_tpu.models.tx_model import (
            init_tx_params,
            quantize_tx_params_w8a8,
            tx_forward,
        )

        cfg = presets.sup_v50_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        sig = jnp.asarray(
            np.random.RandomState(1).randn(2, 1536).astype(np.float32)
        )
        ref = np.asarray(tx_forward(params, sig, cfg))
        got = np.asarray(tx_forward(quantize_tx_params_w8a8(params), sig, cfg))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert rel < 0.06, rel
        assert agree > 0.90, agree


class TestFqBias:
    def test_bias_fused(self, rng):
        x = jnp.asarray(rng.randn(24, 128).astype(np.float32))
        w = rng.randn(256, 128).astype(np.float32)
        wq_t, ws = quantize_weight(w)
        b = jnp.asarray(rng.randn(256).astype(np.float32))
        got = np.asarray(
            w8a8_matmul_fq(x, wq_t, ws, bias=b, out_dtype=jnp.float32)
        )
        want = np.asarray(x) @ w.T + np.asarray(b)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.05, rel

    @pytest.mark.skipif(
        jax.default_backend() == "tpu", reason="interpret mode is a CPU check"
    )
    def test_bias_interpret_matches_fallback(self, rng):
        x = jnp.asarray(rng.randn(16, 128).astype(np.float32))
        wq_t, ws = quantize_weight(rng.randn(128, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        ref = np.asarray(w8a8_matmul_fq(x, wq_t, ws, bias=b, out_dtype=jnp.float32))
        got = np.asarray(
            w8a8_matmul_fq(
                x, wq_t, ws, bias=b, block_m=8, block_n=128,
                out_dtype=jnp.float32, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestLstmW8A8:
    def _cfg(self, name):
        from pathlib import Path

        from dorado_tpu.config import load_model_config

        p = Path("/root/reference/tests/data/model_configs") / name
        if not p.exists():
            pytest.skip("reference model configs unavailable")
        return load_model_config(p)

    def test_hac_stack_parity(self):
        """w8a8 input projections on the Pallas LSTM stack track the full-
        precision scores closely (production default on TPU; the analogue
        of the reference's quantised Koi LSTM kernels)."""
        from dorado_tpu.models.crf_model import (
            init_lstm_crf_params,
            lstm_crf_forward,
            quantize_lstm_crf_params_w8a8,
        )

        cfg = self._cfg("dna_r10.4.1_e8.2_400bps_hac@v4.3.0")
        params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
        qp = quantize_lstm_crf_params_w8a8(params)
        assert "w_ih_q" in qp["lstms"][0] and "w_ih" not in qp["lstms"][0]
        sig = jnp.asarray(
            np.random.RandomState(1).randn(2, 1998).astype(np.float32)
        )
        ref = np.asarray(lstm_crf_forward(params, sig, cfg, use_pallas=True))
        got = np.asarray(lstm_crf_forward(qp, sig, cfg, use_pallas=True))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert rel < 0.02, rel
        assert agree > 0.98, agree

    def test_fast_layers_stay_full_precision(self):
        """fast's H=96 does not tile the 128-lane MXU: layers must pass
        through unquantised."""
        from dorado_tpu.models.crf_model import (
            init_lstm_crf_params,
            quantize_lstm_crf_params_w8a8,
        )

        cfg = self._cfg("dna_r10.4.1_e8.2_260bps_fast@v4.0.0")
        params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
        qp = quantize_lstm_crf_params_w8a8(params)
        for p in qp["lstms"]:
            assert "w_ih" in p and "w_ih_q" not in p

    def test_head_quantizer_branch(self):
        """quantize_tx_head_w8a8 exercises the tx_forward 'w8' head +
        upsample branches and permute_head_params' quantised-head path
        (kept for re-running the measured-slower experiment)."""
        from dorado_tpu.models import presets
        from dorado_tpu.models.crf_model import permute_head_params
        from dorado_tpu.models.tx_model import (
            init_tx_params,
            quantize_tx_head_w8a8,
            quantize_tx_params_w8a8,
            tx_forward,
        )

        cfg = presets.sup_v50_config()
        params = init_tx_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        params["layers"] = params["layers"][:2]
        sig = jnp.asarray(
            np.random.RandomState(1).randn(1, 1536).astype(np.float32)
        )
        ref = np.asarray(tx_forward(params, sig, cfg))
        qp = quantize_tx_head_w8a8(quantize_tx_params_w8a8(params))
        assert "w8" in qp["crf"] and "w8" in qp["upsample"]
        got = np.asarray(tx_forward(qp, sig, cfg))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.06, rel
        # block-permuting the quantised head commutes with quantisation
        perm = np.random.RandomState(2).permutation(got.shape[-1])
        pp = permute_head_params(qp, perm)
        got_p = np.asarray(tx_forward(pp, sig, cfg))
        np.testing.assert_allclose(got_p, got[..., perm], rtol=1e-5, atol=1e-5)
