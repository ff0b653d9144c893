"""Adapter/primer detection and record trimming tests."""

import numpy as np
import pytest

from dorado_tpu.demux.adapters import (
    ADAPTERS,
    AdapterScoreResult,
    SingleEndResult,
    determine_trim_interval,
    find_adapters,
    find_primers,
)
from dorado_tpu.demux.trimmer import trim_modbase_info, trim_move_table, trim_record
from dorado_tpu.io.sam import SamRecord, SamTag


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


class TestAdapterDetection:
    def test_lsk110_both_ends(self):
        rng = np.random.RandomState(0)
        front, rear = ADAPTERS["LSK110"]
        seq = front + _rand(rng, 400) + rear
        res = find_adapters(seq, "SQK-LSK114")
        assert res.front.score == 1.0
        assert res.front.position == (0, len(front) - 1)
        assert res.rear.score == 1.0
        assert res.rear.position == (len(seq) - len(rear), len(seq) - 1)

    def test_no_adapter(self):
        rng = np.random.RandomState(1)
        res = find_adapters(_rand(rng, 300), "SQK-LSK114")
        interval = determine_trim_interval(res, 300)
        assert interval == (0, 300)

    def test_trim_interval(self):
        rng = np.random.RandomState(2)
        front, rear = ADAPTERS["LSK110"]
        insert = _rand(rng, 400)
        seq = front + insert + rear
        res = find_adapters(seq, "SQK-LSK114")
        interval = determine_trim_interval(res, len(seq))
        assert seq[interval[0] : interval[1]] == insert

    def test_primer_detection(self):
        rng = np.random.RandomState(3)
        from dorado_tpu.demux.adapters import PRIMERS
        from dorado_tpu.utils import reverse_complement

        ssp, vnp = PRIMERS["cDNA"]
        seq = ssp + _rand(rng, 500) + reverse_complement(vnp)
        res = find_primers(seq, "SQK-LSK114")
        assert res.front.score >= 0.9
        assert res.front.name.startswith("cDNA_FWD")
        assert res.rear.score >= 0.9


class TestMoveTrim:
    def test_trim_move_table(self):
        #            bases:  0     1        2     3
        moves = np.array([1, 0, 1, 0, 0, 1, 1, 0], dtype=np.uint8)
        n_front, trimmed = trim_move_table(moves, (1, 3))
        assert n_front == 2
        assert trimmed.tolist() == [1, 0, 0, 1]

    def test_trim_all(self):
        moves = np.array([1, 1], dtype=np.uint8)
        n_front, trimmed = trim_move_table(moves, (2, 2))
        assert trimmed.size == 0


class TestModbaseTrim:
    def test_reference_example(self):
        # Example from torch_utils/trim.cpp comments:
        # seq=AATCGGAC, MM=A+a?,1,0; probs=[10,20]; interval {1,6}
        seq = "AATCGGAC"
        mm = "A+a?,1,0;"
        ml = np.array([10, 20], dtype=np.uint8)
        new_mm, new_ml = trim_modbase_info(seq, mm, ml, (1, 6))
        # A's at positions 0,1,6; trim keeps [1,6) -> A at position 1 only.
        # Original mods: skip 1 A (pos 0) -> mod at A#1 (pos 1), then skip 0
        # -> mod at A#2 (pos 6). Pos 6 is trimmed; pos 1 kept with 0 skips.
        assert new_mm == "A+a?,0;"
        assert new_ml.tolist() == [10]


class TestTrimRecord:
    def test_full_record(self):
        moves = np.array([2, 1, 0, 1, 1, 0, 1, 0], dtype=np.int8)  # stride 2 first
        rec = SamRecord(
            qname="r",
            seq="ACGT",
            qual="IJKL",
            tags=[
                SamTag("mv", "B", moves, subtype="c"),
                SamTag("ts", "i", 10),
                SamTag("ns", "i", 24),
            ],
        )
        trim_record(rec, (1, 3))
        assert rec.seq == "CG"
        assert rec.qual == "JK"
        mv = rec.tags[0].value
        assert int(mv[0]) == 2
        # moves for bases 1..2: [1, 0, 1, 0] -> wait base2's span ends at next move
        ts = next(t for t in rec.tags if t.tag == "ts").value
        assert ts == 10 + 2 * 2  # 2 positions trimmed * stride

    def test_noop_interval(self):
        rec = SamRecord(qname="r", seq="ACGT", qual="IIII")
        trim_record(rec, (0, 4))
        assert rec.seq == "ACGT"
