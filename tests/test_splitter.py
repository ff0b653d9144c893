"""Read-splitting tests — golden parity with the reference's 4-subread split
fixture (tests/DuplexSplitTest.cpp:62-75: sizes 6858/7854/5185/5168) plus
pore-signal detection and RNA splitting."""

from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.io.tensor_file import load_tensor
from dorado_tpu.splitter import (
    DuplexReadSplitter,
    DuplexSplitSettings,
    RNAReadSplitter,
    RNASplitSettings,
    detect_pore_signal,
)

SPLIT_DIR = Path("/root/reference/tests/data/split")
RNA_DIR = Path("/root/reference/tests/data/rna_split")


class TestDetectPoreSignal:
    def test_basic_clusters(self):
        sig = np.zeros(1000, dtype=np.float32)
        sig[100:105] = 5.0
        sig[400] = 7.0
        ranges = detect_pore_signal(sig, 2.0, 50, 0)
        assert len(ranges) == 2
        assert (ranges[0].start_sample, ranges[0].end_sample) == (100, 105)
        assert ranges[1].argmax_sample == 400
        assert ranges[1].max_val == 7.0

    def test_cluster_merging(self):
        sig = np.zeros(1000, dtype=np.float32)
        sig[100] = 5.0
        sig[130] = 6.0  # within cluster_dist -> same cluster
        ranges = detect_pore_signal(sig, 2.0, 50, 0)
        assert len(ranges) == 1
        assert ranges[0].end_sample == 131
        assert ranges[0].argmax_sample == 130

    def test_ignore_prefix(self):
        sig = np.zeros(1000, dtype=np.float32)
        sig[10] = 9.0
        assert detect_pore_signal(sig, 2.0, 50, 100) == []


class TestDuplexSplitGolden:
    @pytest.fixture(scope="class")
    def fixture_read(self):
        seq = (SPLIT_DIR / "seq").read_text().strip()
        qstring = (SPLIT_DIR / "qstring").read_text().strip()
        moves = np.frombuffer((SPLIT_DIR / "moves").read_bytes(), dtype=np.uint8)
        signal = load_tensor(SPLIT_DIR / "raw.tensor").astype(np.float32)
        return seq, qstring, moves, signal

    def test_four_subread_split(self, fixture_read):
        seq, qstring, moves, signal = fixture_read
        splitter = DuplexReadSplitter(DuplexSplitSettings())
        subs = splitter.split(seq, qstring, moves, signal, stride=5)
        assert len(subs) == 4
        # golden subread sequence lengths (DuplexSplitTest.cpp:70-73)
        assert [len(s.seq) for s in subs] == [6858, 7854, 5185, 5168]
        for s in subs:
            assert len(s.seq) == len(s.qstring)
            assert int(np.sum(s.moves)) == len(s.seq)

    def test_one_subread_fixture(self):
        d = SPLIT_DIR / "one_subread_split"
        seq = (d / "seq").read_text().strip()
        qstring = (d / "qstring").read_text().strip()
        moves = np.frombuffer((d / "moves").read_bytes(), dtype=np.uint8)
        signal = load_tensor(d / "raw.tensor").astype(np.float32)
        splitter = DuplexReadSplitter(DuplexSplitSettings())
        subs = splitter.split(seq, qstring, moves, signal, stride=5)
        # reference: this read yields a single (trimmed) subread
        assert len(subs) == 1


class TestRNASplit:
    def test_rna_fixture(self):
        signal = load_tensor(RNA_DIR / "signal.tensor")
        assert signal.dtype == np.int16
        splitter = RNAReadSplitter(RNASplitSettings())
        ranges = splitter.split(signal)
        assert len(ranges) >= 1
        # ranges tile the signal (minus spacer regions), are ordered
        last_end = 0
        for s, e in ranges:
            assert s >= last_end
            assert e > s
            last_end = e

    def test_no_split(self):
        sig = np.zeros(10000, dtype=np.int16)
        assert RNAReadSplitter().split(sig) == [(0, 10000)]
