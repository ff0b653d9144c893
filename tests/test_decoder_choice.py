"""Decoder accuracy ranking on synthetic truth lattices (decode/accuracy.py).

Grounds the shipping-default decision (exact Viterbi vs reference beam-32):
on lattices with a known truth path, the exact decoder must not be less
accurate than the width-32 beam approximation in the operating regime
(accuracy >= ~0.85, where real basecalling models live). The full study —
docs/decoder_choice.md — runs more chunks/noise levels; this is the CI
ranking guard.
"""

import numpy as np
import pytest

from dorado_tpu.decode.accuracy import run_study, synthetic_lattice


def test_synthetic_lattice_truth_recoverable():
    """At low noise both decoders recover the truth almost exactly."""
    rows = run_study(sigmas=(0.6,), n_chunks=3, t_len=300, seed=7)
    assert rows[0]["viterbi_acc"] > 0.995
    assert rows[0]["beam_acc"] > 0.97


def test_viterbi_not_worse_than_beam_in_operating_regime():
    """In the usable-accuracy regime the exact path >= the beam-32
    approximation (it can only miss through score ties)."""
    rows = run_study(sigmas=(1.0, 1.2), n_chunks=5, t_len=400, seed=3)
    for row in rows:
        assert row["viterbi_acc"] >= row["beam_acc"] - 0.005, row


def test_lattice_shapes_and_moves():
    rng = np.random.RandomState(0)
    scores, seq, states, moves = synthetic_lattice(rng, 200, state_len=3)
    assert scores.shape == (200, 4**3 * 4)
    assert moves[0] == 1
    assert len(seq) == int(moves.sum())
    # states only change on moves
    changed = states[1:] != states[:-1]
    assert not np.any(changed & (moves[1:] == 0))


def test_model_score_study_ranking_holds():
    """On lattices with a model-generated (correlated) noise field the
    viterbi >= beam ranking must hold at the operating margin — the
    round-4 evidence behind the default-decoder flip
    (docs/decoder_choice.md, model-generated scores section)."""
    from dorado_tpu.decode.accuracy import run_model_score_study

    rows = run_model_score_study(margins=(4.0,), n_chunks=2, chunk=1996)
    row = rows[0]
    assert row["viterbi_acc"] >= row["beam_acc"] - 0.005, row
    assert row["viterbi_acc"] > 0.95, row
