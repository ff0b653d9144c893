"""On-device batched beam search (ops/beam.py) parity vs the exact C++
oracle (native/beam.cpp, itself bit-exact vs decode/beam_search.py and the
reference beam_search.cpp:126-520)."""

import numpy as np
import pytest

from dorado_tpu.native import beam_search_native
from dorado_tpu.ops.beam import beam_search_device
from dorado_tpu.ops.crf_scan import backward_scores

import jax
import jax.numpy as jnp


def _make_scores(rng, t, n, num_states, scale):
    return (rng.randn(t, n, num_states * 4) * scale).astype(np.float32)


@pytest.mark.parametrize(
    "num_states,t,scale",
    [(256, 120, 2.0), (1024, 60, 2.0), (256, 90, 0.5)],
)
def test_device_beam_matches_cpp_oracle(num_states, t, scale):
    rng = np.random.RandomState(num_states + t)
    n = 6
    scores = _make_scores(rng, t, n, num_states, scale)
    beta = np.asarray(backward_scores(jnp.asarray(scores), 2.0))
    states_d, moves_d = beam_search_device(
        jnp.asarray(scores), jnp.asarray(beta), 32, 100.0, 2.0
    )
    states_d = np.asarray(states_d)
    moves_d = np.asarray(moves_d)
    posts = np.zeros((t, num_states), np.float32)  # unused by state parity
    for i in range(n):
        s_h, m_h, _, _ = beam_search_native(
            scores[:, i], beta[:, i], posts, 32, 100.0, 2.0
        )
        np.testing.assert_array_equal(states_d[i], s_h)
        np.testing.assert_array_equal(moves_d[i], m_h)


class TestBeamPallasKernel:
    """Mosaic beam step kernel (ops/beam_pallas.py) must reproduce the XLA
    device beam exactly — same candidate order, merge, cutoff and
    selection semantics (interpret mode here; the TPU path is exercised by
    bench.py and the runner)."""

    @pytest.mark.parametrize("s,t,n,seed", [(64, 64, 2, 1), (256, 48, 2, 2)])
    def test_matches_xla_device_beam(self, s, t, n, seed):
        from dorado_tpu.ops.beam import beam_search_device
        from dorado_tpu.ops.beam_pallas import beam_search_pallas
        from dorado_tpu.ops.crf_scan import backward_scores

        scores = (
            jax.random.normal(jax.random.PRNGKey(seed), (t, n, 4 * s), jnp.float32)
            * 2.0
        )
        bg = backward_scores(scores, 2.0)
        s1, m1 = beam_search_device(scores, bg, 32, 100.0, 2.0)
        s2, m2 = beam_search_pallas(scores, bg, 32, 100.0, 2.0, interpret=True)
        assert np.array_equal(np.asarray(s1), np.asarray(s2))
        assert np.array_equal(np.asarray(m1), np.asarray(m2))
