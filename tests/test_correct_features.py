"""HERRO-style correction features/decode parity (dorado/correct/
features.cpp, decode.cpp semantics on hand-constructed windows)."""

import numpy as np
import pytest

from dorado_tpu.correct.features import (
    DEC,
    ENC,
    WindowFeatures,
    WindowOverlap,
    decode_window,
    get_features_for_window,
    get_supported,
)


def make_window(target, overlap_seqs, fwd=True):
    quals = np.full(len(target), 73.0, np.float32)
    ovs = [
        WindowOverlap(
            seq=s,
            qual=np.full(len(s), 73.0, np.float32),
            cigar=f"{len(s)}M",
            tstart=0,
            fwd=fwd,
        )
        for s in overlap_seqs
    ]
    return get_features_for_window(target, quals, ovs, 0, len(target))


class TestFeatures:
    def test_simple_matrix(self):
        wf = make_window("ACGT", ["ACGT", "ACCT"])
        assert wf.bases.shape == (31, 4)
        # target row
        assert [DEC[b] for b in wf.bases[0]] == list("ACGT")
        # overlap rows (forward, uppercase)
        assert [DEC[b] for b in wf.bases[1]] == list("ACGT")
        assert [DEC[b] for b in wf.bases[2]] == list("ACCT")
        # unused rows padded with '.'
        assert all(DEC[b] == "." for b in wf.bases[5])

    def test_reverse_lowercase(self):
        wf = make_window("ACGT", ["ACGT"], fwd=False)
        assert [DEC[b] for b in wf.bases[1]] == list("acgt")

    def test_insertion_columns(self):
        ov = WindowOverlap(
            seq="ACAGTT",
            qual=np.full(6, 73.0, np.float32),
            cigar="2M1I3M",
            tstart=0,
            fwd=True,
        )
        wf = get_features_for_window(
            "ACGTT", np.full(5, 73.0, np.float32), [ov], 0, 5
        )
        # expanded axis: A C (ins) G T T
        assert wf.bases.shape[1] == 6
        assert [DEC[b] for b in wf.bases[0]] == list("AC*GTT")
        assert [DEC[b] for b in wf.bases[1]] == list("ACAGTT")

    def test_deletion_gap(self):
        ov = WindowOverlap(
            seq="AT",
            qual=np.full(2, 73.0, np.float32),
            cigar="1M2D1M",
            tstart=0,
            fwd=True,
        )
        wf = get_features_for_window("ACGT", np.full(4, 73.0, np.float32), [ov], 0, 4)
        assert [DEC[b] for b in wf.bases[1]] == list("A**T")

    def test_supported_positions(self):
        # 3 reads agree on C at pos1, target + 3 reads give T: two symbols
        # each with count >= 3 -> supported
        wf = make_window("ATGT", ["ACGT", "ACGT", "ACGT", "ATGT", "ATGT"])
        assert (1, 0) in wf.supported
        # position 0: all A (single symbol) -> not supported
        assert (0, 0) not in wf.supported
        # indices point at the expanded columns
        sup_idx = wf.supported.index((1, 0))
        assert wf.indices[sup_idx] == 1


class TestDecode:
    def test_majority_vote_correction(self):
        wf = make_window("ATGT", ["ACGT", "ACGT"])
        wf.inferred_bases = ""
        wf.supported = []
        wf.indices = np.asarray([], np.int32)
        assert decode_window(wf) == "ACGT"  # two reads beat the target base

    def test_tie_keeps_target(self):
        wf = make_window("ATGT", ["ACGT", "ATGT"])
        wf.supported = []
        wf.indices = np.asarray([], np.int32)
        # pos1: C=1, T=2 (incl. target) -> keep majority T;
        # with one read each the target wins the tie
        assert decode_window(wf)[1] == "T"

    def test_inferred_base_overrides(self):
        wf = make_window("ATGT", ["ACGT", "ACGT", "ACGT", "ATGT", "ATGT"])
        assert (1, 0) in wf.supported
        wf.inferred_bases = "".join(
            "C" if sup == (1, 0) else "A" for sup in wf.supported
        )
        out = decode_window(wf)
        assert out[1] == "C"

    def test_inferred_deletion_drops_base(self):
        wf = make_window("ATGT", ["ACGT", "ACGT", "ACGT", "ATGT", "ATGT"])
        wf.inferred_bases = "*" * len(wf.supported)
        out = decode_window(wf)
        assert len(out) < 4

    def test_too_few_alignments(self):
        wf = make_window("ACGT", ["ACGT"])
        assert decode_window(wf) == ""


class TestNNPlumbing:
    def test_forward_shapes_and_predict(self):
        import jax

        from dorado_tpu.correct.nn_model import (
            correction_forward,
            init_correction_model,
            predict_supported,
        )

        params = init_correction_model(jax.random.PRNGKey(0))
        wf = make_window("ATGT", ["ACGT", "ACGT", "ACGT", "ATGT", "ATGT"])
        logits = correction_forward(
            params, np.asarray(wf.bases[None]), np.asarray(wf.quals[None])
        )
        assert logits.shape == (1, 4, 5)
        preds = predict_supported(params, wf)
        assert len(preds) == len(wf.supported)
        assert all(c in "ACGT*" for c in preds)

    def test_corrector_nn_mode(self):
        from dorado_tpu.correct import ReadCorrector

        rng = np.random.RandomState(0)
        truth = "".join(rng.choice(list("ACGT"), 1500))
        reads = []
        for i in range(6):
            s = list(truth)
            for p in rng.choice(len(truth), 8, replace=False):
                s[p] = rng.choice([b for b in "ACGT" if b != s[p]])
            reads.append((f"r{i}", "".join(s)))
        corrector = ReadCorrector(use_nn=True)
        corrected = dict(corrector.correct(reads))
        # errors at unsupported positions are fixed by the vote fallback;
        # structural check that all reads survive with plausible lengths
        assert len(corrected) == 6
        for name, seq in corrected.items():
            assert abs(len(seq) - 1500) < 30


class TestTorchScriptScorer:
    def test_contract(self, tmp_path):
        torch = pytest.importorskip("torch")

        from typing import List

        class Fake(torch.nn.Module):
            def forward(
                self,
                bases: torch.Tensor,
                quals: torch.Tensor,
                lengths: torch.Tensor,
                indices: List[torch.Tensor],
            ):
                # predict 'C' (class 1) at every supported position
                n = indices[0].shape[0]
                logits = torch.zeros(n, 5)
                logits[:, 1] = 5.0
                return bases, logits

        path = tmp_path / "fake.pt"
        from dorado_tpu.utils.torchscript import script_and_save

        script_and_save(Fake(), path)

        from dorado_tpu.correct.nn_model import TorchScriptScorer

        scorer = TorchScriptScorer(str(path))
        wf = make_window("ATGT", ["ACGT", "ACGT", "ACGT", "ATGT", "ATGT"])
        preds = scorer.predict(wf)
        assert preds == "C" * len(wf.supported)
