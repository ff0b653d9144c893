"""C++ beam search parity against the golden numpy implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.decode.beam_search import beam_search
from dorado_tpu.native import beam_search_native
from dorado_tpu.ops.crf_scan import backward_scores, forward_scores


@pytest.mark.parametrize("seed,t_len,num_states", [(0, 100, 256), (1, 64, 1024), (2, 200, 64)])
def test_native_matches_python(seed, t_len, num_states):
    rng = np.random.RandomState(seed)
    scores = (rng.randn(t_len, num_states * 4) * 2).astype(np.float32)
    stnc = jnp.asarray(scores)[:, None, :]
    alpha = np.asarray(forward_scores(stnc, 2.0))[:, 0]
    beta = np.asarray(backward_scores(stnc, 2.0))[:, 0]
    posts = np.asarray(jax.nn.softmax(jnp.asarray(alpha + beta), axis=-1))

    s_py, m_py, q_py, sc_py = beam_search(scores, beta, posts, 32, 100.0, 2.0)
    s_cc, m_cc, q_cc, sc_cc = beam_search_native(scores, beta, posts, 32, 100.0, 2.0)

    np.testing.assert_array_equal(s_py, s_cc)
    np.testing.assert_array_equal(m_py, m_cc)
    np.testing.assert_allclose(q_py, q_cc, atol=1e-5)
    assert abs(sc_py - sc_cc) < 1e-3


def test_beam_width_variants():
    rng = np.random.RandomState(3)
    t_len, num_states = 80, 256
    scores = (rng.randn(t_len, num_states * 4) * 2).astype(np.float32)
    stnc = jnp.asarray(scores)[:, None, :]
    beta = np.asarray(backward_scores(stnc, 2.0))[:, 0]
    posts = np.asarray(jax.nn.softmax(jnp.asarray(beta), axis=-1))
    for width in (8, 32, 64):
        s_py, m_py, _, _ = beam_search(scores, beta, posts, width, 100.0, 2.0)
        s_cc, m_cc, _, _ = beam_search_native(scores, beta, posts, width, 100.0, 2.0)
        np.testing.assert_array_equal(s_py, s_cc)
        np.testing.assert_array_equal(m_py, m_cc)
