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


def test_qscore_calibration_transfers():
    """A qbias-style shift fitted on calibration chunks lands held-out
    mean Q near accuracy-implied Q on model-generated lattices — the
    mechanism behind the reference's per-model trained qbias/qscale
    (docs/decoder_choice.md calibration section). Raw random-weight
    posteriors are under-confident (arbitrary softmax temperature from
    the z-scored field); the ORDERING must calibrate with one shift."""
    from dorado_tpu.decode.accuracy import run_calibration_study

    rows = run_calibration_study(margins=(4.0,), n_chunks=6, chunk=1996)
    row = rows[0]
    # held-out calibrated Q within 3.5 of implied (eval set carries only
    # a handful of edit errors, so implied Q moves in ~3 dB steps)
    assert abs(row["q_cal"] - row["q_implied"]) < 3.5, row
    # and the raw posterior really is far off without the trained shift
    assert row["q_implied"] - row["q_raw"] > 5.0, row


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
