"""Correction window extraction tests (windows.cpp extract_windows /
split_alignment, features.cpp per-window TOP_K accuracy selection)."""

import numpy as np

from dorado_tpu.correct.windows import _Aln, _split_alignment, extract_windows


def _aln(seq, cigar, tstart=0, fwd=True, qname="q"):
    return _Aln(
        seq=seq,
        qual=np.full(len(seq), 73.0, np.float32),
        cigar=cigar,
        tstart=tstart,
        fwd=fwd,
        qname=qname,
    )


class TestSplitAlignment:
    def test_match_split_at_boundary(self):
        # 20M spanning two 10-wide windows
        a = _aln("A" * 20, "20M", tstart=0)
        pieces = _split_alignment(a, [(0, 10), (10, 20)])
        assert pieces[0].cigar == "10M" and pieces[1].cigar == "10M"
        assert pieces[0].seq == "A" * 10 and pieces[1].seq == "A" * 10
        assert pieces[0].tstart == 0 and pieces[1].tstart == 10

    def test_deletion_split(self):
        # 5M10D5M over windows [0,10) [10,20): the deletion splits 5/5
        a = _aln("A" * 10, "5M10D5M", tstart=0)
        pieces = _split_alignment(a, [(0, 10), (10, 20)])
        assert pieces[0].cigar == "5M5D"
        assert pieces[1].cigar == "5D5M"
        assert pieces[1].seq == "A" * 5

    def test_insertion_stays_with_preceding_base(self):
        # insertion after target pos 9 belongs to window 0
        a = _aln("A" * 23, "10M3I10M", tstart=0)
        pieces = _split_alignment(a, [(0, 10), (10, 20)])
        assert pieces[0].cigar == "10M3I"
        assert pieces[0].seq == "A" * 13
        assert pieces[1].cigar == "10M"

    def test_offset_start_and_soft_clip(self):
        a = _aln("C" * 12, "2S8M2S", tstart=14)
        pieces = _split_alignment(a, [(0, 10), (10, 20), (20, 30)])
        assert set(pieces) == {1, 2}
        assert pieces[1].cigar == "6M" and pieces[1].tstart == 14
        assert pieces[2].cigar == "2M" and pieces[2].tstart == 20
        # query slices: clip 2, then 6 in window 1, 2 in window 2
        assert pieces[1].seq == "C" * 6
        assert pieces[2].seq == "C" * 2


class TestExtractWindows:
    def test_short_target_single_window(self):
        # target shorter than window_size still corrects (effective window)
        target = "ACGT" * 50  # 200 bp
        alns = [_aln(target, "200M", qname=f"q{i}") for i in range(3)]
        wins = extract_windows(target, alns, window_size=4096)
        assert len(wins) == 1
        ws, wl, pieces = wins[0]
        assert (ws, wl) == (0, 200)
        assert len(pieces) == 3

    def test_span_filter(self):
        # alignments spanning less than a window are skipped
        target = "A" * 100
        short = _aln("A" * 30, "30M", tstart=10)
        full = _aln("A" * 100, "100M")
        wins = extract_windows(target, [short, full], window_size=50)
        assert [len(p) for _, _, p in wins] == [1, 1]

    def test_edge_overhang_rule(self):
        # an alignment starting at 40% of the window is admitted only from
        # the next full window, not the partial first one
        target = "A" * 100
        late = _aln("A" * 80, "60M", tstart=40)  # qspan 60 >= 50
        late.seq = "A" * 60
        wins = extract_windows(target, [late], window_size=50)
        assert len(wins[0][2]) == 0  # tstart 40 >= 0.1*50 -> skip window 0
        assert len(wins[1][2]) == 1

    def test_top_k_by_accuracy(self):
        from dorado_tpu.correct.features import TOP_K

        target = "ACGT" * 25  # 100
        perfect = [_aln(target, "100M", qname=f"p{i}") for i in range(TOP_K)]
        noisy_seq = "T" * 100  # mostly mismatching
        noisy = [_aln(noisy_seq, "100M", qname=f"n{i}") for i in range(5)]
        wins = extract_windows(target, noisy + perfect, window_size=100)
        _, _, pieces = wins[0]
        assert len(pieces) == TOP_K
        # all kept pieces are the accurate ones
        assert all(p.seq == target for p in pieces)


class TestWindowedCorrection:
    def test_multi_window_equals_truth(self):
        """Corrector with a small window produces the true sequence across
        window seams (concatenated per-window decodes)."""
        from dorado_tpu.correct.corrector import ReadCorrector

        rng = np.random.RandomState(11)
        truth = "".join(rng.choice(list("ACGT"), 1200))
        reads = [("t", truth)]
        # 6 noisy copies with scattered substitutions
        for i in range(6):
            seq = list(truth)
            for p in rng.choice(len(seq), 12, replace=False):
                seq[p] = "ACGT"[rng.randint(4)]
            reads.append((f"r{i}", "".join(seq)))
        corrector = ReadCorrector(use_nn=False, window_size=256)
        # vote path sanity (window-independent)
        out = dict(corrector.correct(reads, targets={"t"}))
        assert out["t"] == truth

        nn = ReadCorrector(use_nn=True, window_size=256)
        out_nn = dict(nn.correct(reads, targets={"t"}))
        # random-weight NN only predicts at supported positions; the decode
        # falls back to majority vote elsewhere, so length stays plausible
        assert abs(len(out_nn["t"]) - len(truth)) < 60
