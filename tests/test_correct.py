"""Read correction tests: simulated overlapping reads from a shared truth
sequence; errors in individual reads must be outvoted by the consensus."""

import numpy as np
import pytest

from dorado_tpu.correct import ReadCorrector


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _mutate_subs(rng, seq, n_subs):
    s = list(seq)
    pos = rng.choice(len(seq), n_subs, replace=False)
    for p in pos:
        s[p] = rng.choice([b for b in "ACGT" if b != s[p]])
    return "".join(s), set(int(p) for p in pos)


class TestCorrect:
    def test_substitution_errors_fixed(self):
        rng = np.random.RandomState(0)
        truth = _rand(rng, 3000)
        reads = []
        for i in range(8):
            mutated, _ = _mutate_subs(rng, truth, 15)
            reads.append((f"r{i}", mutated))

        corrector = ReadCorrector()
        corrected = dict(corrector.correct(reads))
        assert corrector.stats.overlaps > 0

        # errors drop dramatically after correction
        before = sum(
            sum(a != b for a, b in zip(seq, truth)) for _, seq in reads
        )
        after = sum(
            sum(a != b for a, b in zip(corrected[n], truth))
            for n, _ in reads
            if len(corrected[n]) == len(truth)
        )
        full_length = sum(1 for n, _ in reads if len(corrected[n]) == len(truth))
        assert full_length >= 6
        assert after < before * 0.2

    def test_lonely_read_unchanged(self):
        rng = np.random.RandomState(1)
        reads = [("solo", _rand(rng, 2000))]
        corrector = ReadCorrector()
        out = dict(corrector.correct(reads))
        assert out["solo"] == reads[0][1]
