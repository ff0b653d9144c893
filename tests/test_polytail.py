"""Poly(A) tail estimation — golden parity against the reference's checked-in
test cases (tests/PolyACalculatorTest.cpp:35-37: expected tail lengths per
fixture directory, model stride 5)."""

from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.io.tensor_file import load_tensor
from dorado_tpu.polytail import PolyTailConfig, make_calculator
from dorado_tpu.polytail.calculator import ReadContext

DATA = Path("/root/reference/tests/data/poly_a")

CASES = [
    (134, "r9_rev_cdna", False),
    (32, "r10_fwd_cdna", False),
    (39, "rna002", True),
    (76, "rna004", True),
]


def _load_case(name: str) -> ReadContext:
    d = DATA / name
    seq = (d / "seq.txt").read_text().strip()
    moves = np.frombuffer((d / "moves.bin").read_bytes(), dtype=np.uint8)
    signal = load_tensor(d / "signal.tensor").astype(np.float32)
    return ReadContext(seq=seq, moves=moves, signal=signal, stride=5)


@pytest.mark.parametrize("expected,name,is_rna", CASES)
def test_golden_tail_lengths(expected, name, is_rna):
    read = _load_case(name)
    calc = make_calculator(is_rna=is_rna, is_rna_adapter=False)
    result = calc.calculate_num_bases(read)
    assert result.num_bases == expected


def test_no_anchor_returns_empty():
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGT"), 400))
    moves = np.zeros(400, dtype=np.uint8)
    moves[:: max(1, 400 // len(seq))] = 1
    read = ReadContext(seq=seq, moves=moves, signal=rng.randn(2000).astype(np.float32), stride=5)
    calc = make_calculator(is_rna=False)
    result = calc.calculate_num_bases(read)
    assert result.num_bases == -1
