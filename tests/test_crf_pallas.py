"""Pallas CRF decode kernels: parity vs the XLA scans (interpret mode on CPU).

The kernels stream [T, N, C] score blocks through VMEM with the carry
resident, expanding/reducing the lattice wiring as exact one-hot MXU matmuls
(ops/crf_pallas.py). Parity is against ops/crf_scan.py, itself torch/oracle
parity-tested; the reference runs this decode as fused CUDA kernels
(dorado/basecall/decode/CUDADecoder.cpp:77-106).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.ops.crf_pallas import (
    backward_scores_pallas,
    forward_scores_pallas,
    supports_pallas_decode,
    viterbi_path_pallas,
)
from dorado_tpu.ops.crf_scan import (
    backward_scores,
    forward_scores,
    viterbi_path,
)


def _scores(t, n, c, seed=0, scale=2.0):
    key = jax.random.PRNGKey(seed)
    return (jax.random.normal(key, (t, n, c), jnp.float32) * scale).clip(-5, 5)


@pytest.mark.parametrize("c", [256, 1024])
def test_lse_scans_match_xla(c):
    scores = _scores(12, 8, c)
    a_ref = np.asarray(forward_scores(scores, 2.0))
    b_ref = np.asarray(backward_scores(scores, 2.0))
    a_p = np.asarray(forward_scores_pallas(scores, 2.0, interpret=True))
    b_p = np.asarray(backward_scores_pallas(scores, 2.0, interpret=True))
    assert a_p.shape == a_ref.shape and b_p.shape == b_ref.shape
    assert np.abs(a_p - a_ref).max() < 1e-3
    assert np.abs(b_p - b_ref).max() < 1e-3


def test_lse_long_time_axis_tiles():
    # t chosen so the time-tiling picks bt > 1 and multiple grid tiles
    scores = _scores(24, 4, 1024, seed=1)
    a_ref = np.asarray(forward_scores(scores, 2.0))
    a_p = np.asarray(forward_scores_pallas(scores, 2.0, interpret=True))
    assert np.abs(a_p - a_ref).max() < 1e-3


def test_viterbi_matches_xla():
    scores = _scores(16, 4, 1024, seed=2)
    st_ref, mv_ref = (np.asarray(x) for x in viterbi_path(scores, 2.0))
    st_p, mv_p = (
        np.asarray(x) for x in viterbi_path_pallas(scores, 2.0, interpret=True)
    )
    np.testing.assert_array_equal(st_p, st_ref)
    np.testing.assert_array_equal(mv_p, mv_ref)


def test_supports_pallas_decode():
    assert supports_pallas_decode(1024)  # hac / fast: dense-lattice kernels
    assert supports_pallas_decode(4096)  # sup: block-layout kernels


class TestBlockLayout:
    """sup-sized spaces (state_len 5, C=4096) route through the block-layout
    kernels: scores pre-permuted to c' = r*S + s, wiring via the [S/4, S]
    repeat matrix instead of dense [S, C] lattice matrices."""

    def test_lse_scans_match_xla(self):
        scores = _scores(6, 4, 4096, seed=4, scale=1.5)
        a_ref = np.asarray(forward_scores(scores, 2.0))
        b_ref = np.asarray(backward_scores(scores, 2.0))
        a_p = np.asarray(forward_scores_pallas(scores, 2.0, interpret=True))
        b_p = np.asarray(backward_scores_pallas(scores, 2.0, interpret=True))
        assert np.abs(a_p - a_ref).max() < 1e-3
        assert np.abs(b_p - b_ref).max() < 1e-3

    def test_viterbi_matches_xla(self):
        scores = _scores(8, 2, 4096, seed=5, scale=1.5)
        st_ref, mv_ref = (np.asarray(x) for x in viterbi_path(scores, 2.0))
        st_p, mv_p = (
            np.asarray(x) for x in viterbi_path_pallas(scores, 2.0, interpret=True)
        )
        np.testing.assert_array_equal(st_p, st_ref)
        np.testing.assert_array_equal(mv_p, mv_ref)


def test_fused_forward_decode_matches_separate():
    """The fused alpha/posts/choices kernel must match the separate kernels:
    posts vs softmax(alpha+beta) and choices/final vs the Viterbi kernel."""
    from dorado_tpu.ops.crf_pallas import (
        _viterbi_fwd_pallas,
        fused_forward_decode_pallas,
        supports_fused_decode,
    )

    assert supports_fused_decode(1024) and supports_fused_decode(4096)
    scores = _scores(12, 4, 1024, seed=5)
    alpha = forward_scores(scores, 2.0)
    beta = backward_scores(scores, 2.0)
    posts_ref = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))[1:]
    ch_ref, fin_ref = _viterbi_fwd_pallas(scores, 2.0, True)
    posts, choices, final = fused_forward_decode_pallas(
        scores, beta, 2.0, interpret=True
    )
    assert np.abs(np.asarray(posts) - posts_ref).max() < 1e-3
    np.testing.assert_array_equal(np.asarray(choices), np.asarray(ch_ref))
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(fin_ref), rtol=1e-5, atol=1e-5
    )


def test_traceback_kernel_matches_xla():
    """viterbi_traceback_pallas (one-hot-plane traceback, reverse-streamed
    choices) must match the XLA scan exactly."""
    from dorado_tpu.ops.crf_pallas import viterbi_traceback_pallas
    from dorado_tpu.ops.crf_scan import viterbi_traceback

    rs = np.random.RandomState(11)
    t, n, s = 24, 8, 256
    choices = jnp.asarray(rs.randint(0, 5, (t, n, s)).astype(np.int8))
    last = jnp.asarray(rs.randint(0, s, (n,)).astype(np.int32))
    st_ref, mv_ref = viterbi_traceback(choices, last)
    st_p, mv_p = viterbi_traceback_pallas(choices, last, interpret=True)
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_ref))
    np.testing.assert_array_equal(np.asarray(mv_p), np.asarray(mv_ref))


def test_fused_forward_decode_block_layout():
    """sup-sized spaces (C=4096) route through the block-layout fused
    kernel; posts/choices/final match the separate block kernels."""
    from dorado_tpu.ops.crf_pallas import (
        _viterbi_fwd_pallas_blk,
        fused_forward_decode_pallas,
        supports_fused_decode,
    )

    assert supports_fused_decode(4096)
    scores = _scores(6, 4, 4096, seed=8, scale=1.5)
    beta = backward_scores(scores, 2.0)
    alpha = forward_scores(scores, 2.0)
    posts_ref = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))[1:]
    ch_ref, fin_ref = _viterbi_fwd_pallas_blk(scores, 2.0, True)
    posts, choices, final = fused_forward_decode_pallas(
        scores, beta, 2.0, interpret=True
    )
    assert np.abs(np.asarray(posts) - posts_ref).max() < 1e-3
    np.testing.assert_array_equal(np.asarray(choices), np.asarray(ch_ref))
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(fin_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("t,n", [(7, 2), (14, 6), (34, 12)])
def test_fused_decode_shape_sweep(t, n):
    """Odd batch/time shapes tile correctly through the fused kernel and
    the Pallas traceback (bn/bt pickers must divide, not assume powers)."""
    from dorado_tpu.ops.crf_pallas import (
        fused_forward_decode_pallas,
        viterbi_traceback_pallas,
    )
    from dorado_tpu.ops.crf_scan import viterbi_path

    scores = _scores(t, n, 1024, seed=t * 100 + n)
    beta = backward_scores(scores, 2.0)
    alpha = forward_scores(scores, 2.0)
    posts_ref = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))[1:]
    st_ref, mv_ref = (np.asarray(x) for x in viterbi_path(scores, 2.0))

    posts, choices, final = fused_forward_decode_pallas(
        scores, beta, 2.0, interpret=True
    )
    assert np.abs(np.asarray(posts) - posts_ref).max() < 1e-3
    last = jnp.argmax(final, axis=-1).astype(jnp.int32)
    st, mv = viterbi_traceback_pallas(choices, last, interpret=True)
    np.testing.assert_array_equal(np.asarray(st), st_ref)
    np.testing.assert_array_equal(np.asarray(mv), mv_ref)


class TestCombinedBlockLayout:
    """hac-sized spaces (S=256) use the block-layout kernels with the
    combined [S, C] expand matrix (one MXU pass per time-row instead of
    four per-slot matmuls) on the runner's prepermuted fast path. Parity
    vs the XLA scans on raw-layout scores."""

    def test_prepermuted_lse_scans_match_xla(self):
        from dorado_tpu.ops.crf_pallas import (
            _lse_scan_pallas_blk,
            _use_combined,
            block_permutation,
        )

        assert _use_combined(256)
        scores = _scores(12, 8, 1024, seed=6)
        perm = jnp.asarray(block_permutation(256))
        blk = scores[..., perm]
        a_ref = np.asarray(forward_scores(scores, 2.0))
        b_ref = np.asarray(backward_scores(scores, 2.0))
        a_p = np.asarray(
            _lse_scan_pallas_blk(blk, 2.0, False, True, prepermuted=True)
        )
        b_p = np.asarray(
            _lse_scan_pallas_blk(blk, 2.0, True, True, prepermuted=True)
        )
        assert np.abs(a_p - a_ref).max() < 1e-3
        assert np.abs(b_p - b_ref).max() < 1e-3

    def test_prepermuted_fused_viterbi_decode(self):
        from dorado_tpu.ops.crf_pallas import (
            block_permutation,
            fused_viterbi_decode,
            viterbi_traceback_pallas,
        )

        scores = _scores(14, 4, 1024, seed=7)
        perm = jnp.asarray(block_permutation(256))
        blk = scores[..., perm]
        alpha = forward_scores(scores, 2.0)
        beta = backward_scores(scores, 2.0)
        posts_ref = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))[1:]
        st_ref, mv_ref = (np.asarray(x) for x in viterbi_path(scores, 2.0))

        posts, choices, final = fused_viterbi_decode(
            blk, 2.0, interpret=True, prepermuted=True
        )
        assert np.abs(np.asarray(posts) - posts_ref).max() < 1e-3
        last = jnp.argmax(final, axis=-1).astype(jnp.int32)
        st, mv = viterbi_traceback_pallas(choices, last, interpret=True)
        np.testing.assert_array_equal(np.asarray(st), st_ref)
        np.testing.assert_array_equal(np.asarray(mv), mv_ref)

    def test_head_permute_matches_score_permute(self):
        """Baking block_permutation into the CRF head's output rows emits
        the same block-layout scores as permuting raw scores after."""
        from dorado_tpu.models.crf_model import (
            make_crf_forward_fn,
            init_lstm_crf_params,
            permute_head_params,
        )
        from dorado_tpu.models.presets import hac_v43_config
        from dorado_tpu.ops.crf_pallas import block_permutation

        config = hac_v43_config()
        params = init_lstm_crf_params(config, jax.random.PRNGKey(3))
        fwd = make_crf_forward_fn(config)
        sig = jax.random.normal(jax.random.PRNGKey(4), (2, config.stride * 32))
        raw = np.asarray(fwd(params, sig))
        perm = block_permutation(config.num_states)
        permuted = np.asarray(fwd(permute_head_params(params, perm), sig))
        np.testing.assert_allclose(raw[..., perm], permuted, rtol=1e-6, atol=1e-6)
