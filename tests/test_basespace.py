"""Basespace duplex consensus tests."""

import numpy as np

from dorado_tpu.duplex.basespace import (
    basespace_duplex_call,
    get_trimmed_alignment,
    preprocess_quality_scores,
)
from dorado_tpu.utils import reverse_complement


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


class TestQualityPreprocess:
    def test_min_pool(self):
        q = np.array([40, 40, 10, 40, 40, 40, 40], dtype=np.uint8)
        out = preprocess_quality_scores(q)
        # window 5 centred: positions within 2 of the dip take the min
        assert out[2] == 10
        assert out[0] == 10  # window [pad,pad,40,40,10]
        assert out[6] == 40


class TestTrimmedAlignment:
    def test_all_matches(self):
        aln = np.zeros(50, dtype=np.uint8)
        (s, e), (qc, tc) = get_trimmed_alignment(5, aln, 0, 0, 0, 49)
        assert s == 0 and e == 49
        assert qc == 0 and tc == 0

    def test_leading_mismatches(self):
        aln = np.concatenate([np.full(10, 3, np.uint8), np.zeros(60, np.uint8)])
        (s, e), (qc, tc) = get_trimmed_alignment(5, aln, 0, 0, 0, 69)
        assert s == 10
        assert qc == 10 and tc == 10


class TestBasespaceCall:
    def test_perfect_pair(self):
        rng = np.random.RandomState(0)
        seq = _rand(rng, 1000)
        q_t = chr(33 + 30) * 1000
        q_c = chr(33 + 20) * 1000
        comp = reverse_complement(seq)
        result = basespace_duplex_call(seq, q_t, comp, q_c)
        assert result is not None
        consensus, qstring = result
        # consensus must reproduce the overlapping region of the template
        assert consensus in seq
        assert len(consensus) > 900
        assert len(consensus) == len(qstring)

    def test_quality_vote_picks_better_strand(self):
        rng = np.random.RandomState(1)
        seq = _rand(rng, 800)
        # complement has one error but lower quality there -> template wins
        comp_seq = list(seq)
        comp_seq[400] = "A" if seq[400] != "A" else "C"
        comp = reverse_complement("".join(comp_seq))
        q_t = chr(33 + 35) * 800
        q_c = chr(33 + 15) * 800
        result = basespace_duplex_call(seq, q_t, comp, q_c)
        assert result is not None
        consensus, _ = result
        assert consensus in seq  # the error was outvoted

    def test_empty_inputs_return_none(self):
        assert basespace_duplex_call("", "", "ACGT", "IIII") is None
        assert basespace_duplex_call("ACGT", "IIII", "", "") is None

    def test_short_dissimilar_returns_none(self):
        # too short to reach the min trimmed-alignment length of 25
        rng = np.random.RandomState(2)
        a = _rand(rng, 30)
        b = _rand(rng, 30)
        assert basespace_duplex_call(a, "I" * 30, b, "I" * 30) is None
