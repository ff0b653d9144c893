"""On-device sequence materialisation parity vs the host generate_sequence
reference (bf16 qual transfer allows rare ±1 phred-char rounding)."""

import jax
import numpy as np
import pytest

from dorado_tpu.basecall.runner import BasecallRunner
from dorado_tpu.decode.common import generate_sequence
from dorado_tpu.models.crf_model import init_lstm_crf_params, lstm_crf_forward
from dorado_tpu.models.presets import fast_v40_config
from dorado_tpu.ops.crf_scan import backward_scores, forward_scores, viterbi_path
import jax.numpy as jnp


def test_device_matches_host_materialisation():
    cfg = fast_v40_config()
    params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
    runner = BasecallRunner(cfg, params, chunk_size=1000, batch_size=4, decoder="viterbi")
    rng = np.random.RandomState(0)
    buffer = runner.make_input_buffer()
    for i in range(4):
        buffer[i] = rng.randn(1000).astype(np.float32)
    decoded = runner.call_chunks(buffer, 4)

    # host reference path
    scores = lstm_crf_forward(runner.params, jnp.asarray(buffer), cfg)
    scores_tnc = jnp.swapaxes(scores, 0, 1)
    alpha = forward_scores(scores_tnc, 2.0)
    beta = backward_scores(scores_tnc, 2.0)
    posts = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))
    states, moves = viterbi_path(scores_tnc, 2.0)
    states = np.asarray(states).T
    moves = np.asarray(moves).T

    from dorado_tpu.basecall.runner import _qual_data_from_posts_batch

    qual = _qual_data_from_posts_batch(states, posts.transpose(1, 0, 2), cfg.num_states)

    for i in range(4):
        seq, qstring = generate_sequence(
            moves[i], states[i], qual[i], cfg.qbias, cfg.qscale
        )
        assert decoded[i].sequence == seq
        np.testing.assert_array_equal(decoded[i].moves, moves[i])
        # bf16 qual: allow rare off-by-one phred chars
        a = np.frombuffer(decoded[i].qstring.encode(), np.uint8).astype(int)
        b = np.frombuffer(qstring.encode(), np.uint8).astype(int)
        assert len(a) == len(b)
        if len(a):
            assert np.abs(a - b).max() <= 1
            assert (a != b).mean() <= 0.05


def test_device_beam_matches_host_beam():
    """decoder="beam" (fully on-device) must produce the same sequences and
    moves as decoder="beam-host" (device scans + exact C++ oracle beam);
    qstrings may differ by bf16 rounding only."""
    cfg = fast_v40_config()
    params = init_lstm_crf_params(cfg, jax.random.PRNGKey(2))
    kw = dict(chunk_size=1000, batch_size=8)
    dev = BasecallRunner(cfg, params, decoder="beam", **kw)
    host = BasecallRunner(cfg, params, decoder="beam-host", **kw)
    rng = np.random.RandomState(7)
    buffer = dev.make_input_buffer()
    for i in range(8):
        buffer[i] = rng.randn(1000).astype(np.float32)
    got = dev.call_chunks(buffer.copy(), 8)
    want = host.call_chunks(buffer.copy(), 8)
    for g, w in zip(got, want):
        assert g.sequence == w.sequence
        np.testing.assert_array_equal(g.moves, w.moves)
        a = np.frombuffer(g.qstring.encode(), np.uint8).astype(int)
        b = np.frombuffer(w.qstring.encode(), np.uint8).astype(int)
        assert len(a) == len(b)
        if len(a):
            assert np.abs(a - b).max() <= 1
            assert (a != b).mean() <= 0.05
