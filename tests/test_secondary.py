"""Polishing subsystem tests: pileup counts, GRU torch parity, consensus
decode, and an end-to-end polish over simulated reads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.secondary.model import (
    decode_consensus,
    gru_forward,
    init_gru_params,
)
from dorado_tpu.secondary.pileup import AlignedRead, build_pileup
from dorado_tpu.secondary.polish import PolishPipeline


class TestPileup:
    def test_simple_matches(self):
        reads = [
            AlignedRead(ref_start=0, cigar="4M", seq="ACGT", is_reverse=False),
            AlignedRead(ref_start=0, cigar="4M", seq="ACGT", is_reverse=True),
        ]
        pile = build_pileup(reads, 0, 4, normalise=False)
        assert pile.counts.shape == (4, 10)
        # forward A at position 0 -> column 4 ("A" fwd); reverse -> column 0
        assert pile.counts[0, 4] == 1
        assert pile.counts[0, 0] == 1
        assert pile.positions_minor.sum() == 0

    def test_deletion(self):
        reads = [AlignedRead(ref_start=0, cigar="2M1D2M", seq="ACGT", is_reverse=False)]
        pile = build_pileup(reads, 0, 5, normalise=False)
        assert pile.counts[2, 9] == 1  # del fwd column

    def test_insertion_creates_minor(self):
        reads = [
            AlignedRead(ref_start=0, cigar="2M2I2M", seq="ACGGTT", is_reverse=False),
            AlignedRead(ref_start=0, cigar="4M", seq="ACTT", is_reverse=False),
        ]
        pile = build_pileup(reads, 0, 4, normalise=False)
        # expanded positions: 0,1,(1.1),(1.2),2,3
        assert len(pile.positions_major) == 6
        assert pile.positions_minor.tolist() == [0, 0, 1, 2, 0, 0]
        # the non-inserting read counts as deletion at the minor positions
        minor1 = 2
        assert pile.counts[minor1, 4 + 2] == 1  # inserted G (fwd)
        assert pile.counts[minor1, 9] == 1  # spanning read -> del fwd

    def test_normalisation(self):
        reads = [
            AlignedRead(ref_start=0, cigar="2M", seq="AA", is_reverse=False)
            for _ in range(4)
        ]
        pile = build_pileup(reads, 0, 2)
        np.testing.assert_allclose(pile.counts[0, 4], 1.0)
        np.testing.assert_allclose(pile.depth[0], 4.0)


class TestGRU:
    def test_torch_parity(self):
        torch = pytest.importorskip("torch")
        params = init_gru_params(
            jax.random.PRNGKey(0), num_features=10, num_classes=5, gru_size=16, num_layers=2
        )
        x = np.random.RandomState(0).randn(2, 12, 10).astype(np.float32)
        ours = np.asarray(gru_forward(params, jnp.asarray(x)))

        m = torch.nn.GRU(10, 16, num_layers=2, bidirectional=True, batch_first=True)
        for l, layer in enumerate(params["layers"]):
            for d, key in enumerate(["fwd", "rev"]):
                sfx = f"_l{l}" + ("_reverse" if d else "")
                getattr(m, f"weight_ih{sfx}").data = torch.from_numpy(np.asarray(layer[key]["w_ih"]))
                getattr(m, f"weight_hh{sfx}").data = torch.from_numpy(np.asarray(layer[key]["w_hh"]))
                getattr(m, f"bias_ih{sfx}").data = torch.from_numpy(np.asarray(layer[key]["b_ih"]))
                getattr(m, f"bias_hh{sfx}").data = torch.from_numpy(np.asarray(layer[key]["b_hh"]))
        lin = torch.nn.Linear(32, 5)
        lin.weight.data = torch.from_numpy(np.asarray(params["linear"]["w"]))
        lin.bias.data = torch.from_numpy(np.asarray(params["linear"]["b"]))
        want = lin(m(torch.from_numpy(x))[0]).detach().numpy()
        np.testing.assert_allclose(ours, want, atol=2e-5)

    def test_decode(self):
        logits = np.zeros((1, 5, 5), dtype=np.float32)
        for i, c in enumerate([1, 2, 0, 3, 4]):  # A C * G T
            logits[0, i, c] = 5.0
        assert decode_consensus(logits) == "ACGT"


class TestPolishEndToEnd:
    def test_majority_vote_equivalent(self):
        """With an identity-ish model we can't test biology, but the full
        window/pileup/decode plumbing must run and keep zero-coverage spans
        from the draft."""
        rng = np.random.RandomState(0)
        draft = "".join(rng.choice(list("ACGT"), 500))
        reads = [
            AlignedRead(ref_start=0, cigar="250M", seq=draft[:250], is_reverse=False),
            AlignedRead(ref_start=0, cigar="250M", seq=draft[:250], is_reverse=True),
        ]  # second half has no coverage
        params = init_gru_params(jax.random.PRNGKey(1), gru_size=16, num_layers=1)
        pipe = PolishPipeline(params, window_len=200, window_overlap=0)
        out = pipe.polish_contig(draft, reads)
        # uncovered tail comes back verbatim
        assert out.endswith(draft[250:])
        assert pipe.stats.windows == 3

    def test_window_seams_match_whole_contig(self):
        """Overlapping + midpoint-trimmed windows must reproduce the
        whole-contig (single-window) consensus exactly — the reference's
        trim_samples guarantee (sample_trimming.cpp): every emitted column
        is predicted with model context on both sides of the seam."""
        rng = np.random.RandomState(7)
        draft = "".join(rng.choice(list("ACGT"), 900))
        reads = []
        for i in range(8):
            s = int(rng.randint(0, 300))
            ln = int(rng.randint(400, 600))
            sub = list(draft[s : s + ln])
            for p in rng.choice(len(sub), 12, replace=False):
                sub[p] = rng.choice([b for b in "ACGT" if b != sub[p]])
            reads.append(
                AlignedRead(
                    ref_start=s, cigar=f"{len(sub)}M", seq="".join(sub),
                    is_reverse=bool(i % 2),
                )
            )
        params = init_gru_params(jax.random.PRNGKey(2), gru_size=16, num_layers=1)
        whole = PolishPipeline(params, window_len=2000).polish_contig(draft, reads)
        windowed_pipe = PolishPipeline(params, window_len=300, window_overlap=150)
        windowed = windowed_pipe.polish_contig(draft, reads)
        assert windowed_pipe.stats.windows > 3
        assert windowed == whole


class TestDiploidVariants:
    def _probs(self, draft, hap0, hap1):
        from dorado_tpu.secondary.model import SYMBOLS

        p = len(draft)
        probs = np.zeros((p, 2, 5), np.float32)
        for i in range(p):
            probs[i, 0, SYMBOLS.index(hap0[i])] = 0.9
            probs[i, 1, SYMBOLS.index(hap1[i])] = 0.9
        return probs

    def test_het_snp(self):
        from dorado_tpu.secondary.variant import call_variants_diploid

        draft = "ACGTACGT"
        hap0 = "ACGTACGT"
        hap1 = "ACCTACGT"  # G->C at pos 2 on hap1 only
        pm = np.arange(8)
        vs = call_variants_diploid(
            draft, "ctg", self._probs(draft, hap0, hap1), pm, np.zeros(8, int)
        )
        assert len(vs) == 1
        v = vs[0]
        assert (v.pos, v.ref, v.alts) == (2, "G", ["C"])
        assert dict(v.genotype)["GT"] == "0/1"  # unphased sorted alleles (normalize_genotype)

    def test_hom_alt_and_multiallelic(self):
        from dorado_tpu.secondary.variant import call_variants_diploid

        draft = "ACGT"
        pm = np.arange(4)
        # hom alt: both haps T at pos 1
        vs = call_variants_diploid(
            draft, "ctg", self._probs(draft, "ATGT", "ATGT"), pm, np.zeros(4, int)
        )
        assert dict(vs[0].genotype)["GT"] == "1/1"
        # multiallelic het: hap0 T, hap1 A at pos 1
        vs = call_variants_diploid(
            draft, "ctg", self._probs(draft, "ATGT", "AAGT"), pm, np.zeros(4, int)
        )
        assert vs[0].alts == ["A", "T"]  # alts stably sorted (normalize_genotype)
        assert dict(vs[0].genotype)["GT"] == "1/2"

    def test_het_deletion(self):
        from dorado_tpu.secondary.variant import call_variants_diploid

        draft = "ACGT"
        pm = np.arange(4)
        vs = call_variants_diploid(
            draft, "ctg", self._probs(draft, "AC*T", "ACGT"), pm, np.zeros(4, int)
        )
        assert len(vs) == 1
        v = vs[0]
        assert (v.pos, v.ref) == (1, "CG")
        assert v.alts == ["C"]
        assert dict(v.genotype)["GT"] == "0/1"
