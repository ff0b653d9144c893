"""Mux-change trim parity vs a direct transcription of the reference scalar
algorithm (read_utils.cpp:68-168)."""

import numpy as np
import pytest

from dorado_tpu.utils.read_trim import (
    find_mux_change_trim_seq_index,
    mux_change_trim,
    sequence_to_move_table_index,
)


def _oracle_trim_index(qstring: str) -> int:
    size = len(qstring)
    trim_index = size - 1
    cum_sum = 0
    cum_sum_min = -1
    for i in range(size - 1, -1, -1):
        qs = ord(qstring[i])
        if qs <= 7 + 33:
            cum_sum += -1
        elif qs <= 12 + 33:
            cum_sum += 1
        else:
            cum_sum += 10
        if cum_sum <= cum_sum_min:
            cum_sum_min = cum_sum
            trim_index = i - 1
        if cum_sum > i:
            break
    return trim_index


def test_trim_index_fuzz():
    rng = np.random.RandomState(0)
    for trial in range(200):
        size = rng.randint(1, 400)
        # mix of quality regimes, biased toward low-q tails sometimes
        q = rng.randint(33, 83, size)
        if trial % 3 == 0:
            tail = rng.randint(0, size)
            q[size - tail :] = rng.randint(33, 41, tail)
        qstring = "".join(chr(c) for c in q)
        assert find_mux_change_trim_seq_index(qstring) == _oracle_trim_index(
            qstring
        ), qstring


def test_move_table_index():
    moves = np.array([1, 0, 0, 1, 1, 0, 1, 0], np.uint8)
    assert sequence_to_move_table_index(moves, 0, 4) == 0
    assert sequence_to_move_table_index(moves, 2, 4) == 4
    assert sequence_to_move_table_index(moves, 3, 4) == 6
    assert sequence_to_move_table_index(moves, 4, 4) == -1
    assert sequence_to_move_table_index(np.array([], np.uint8), 0, 0) == -1


def test_mux_trim_applies_only_on_mux_change():
    rng = np.random.RandomState(1)
    n = 200
    seq = "".join(rng.choice(list("ACGT"), n))
    # high quality front, low-quality tail from base 150
    qstring = chr(33 + 40) * 150 + chr(33 + 3) * 50
    moves = np.zeros(2 * n, np.uint8)
    moves[::2] = 1
    signal = rng.randn(2 * n * 5).astype(np.float32)

    s2, q2, m2, sig2 = mux_change_trim(seq, qstring, moves, signal, 5, "signal_positive")
    assert s2 == seq and len(sig2) == len(signal)

    s3, q3, m3, sig3 = mux_change_trim(seq, qstring, moves, signal, 5, "mux_change")
    assert len(s3) < n
    assert s3 == seq[: len(s3)]
    assert len(q3) == len(s3)
    assert len(sig3) == len(m3) * 5
    # trimmed at the quality cliff (reference argmin lands at its start)
    assert abs(len(s3) - 150) <= 1


def test_mux_trim_guards():
    # short read: untouched
    out = mux_change_trim("ACGT" * 10, "I" * 40, np.ones(40, np.uint8),
                          np.zeros(200, np.float32), 5, "mux_change")
    assert out[0] == "ACGT" * 10
    # all low quality => trim index below 30% floor: untouched
    q = chr(33 + 2) * 200
    out = mux_change_trim("A" * 200, q, np.ones(200, np.uint8),
                          np.zeros(1000, np.float32), 5, "unblock_mux_change")
    assert out[0] == "A" * 200
