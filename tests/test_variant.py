"""Variant calling + VCF writing tests."""

import io

import numpy as np

from dorado_tpu.secondary.variant import VcfWriter, call_variants


def _logits_for(symbol_string):
    """logits whose argmax spells symbol_string over '*ACGT'."""
    sym = "*ACGT"
    out = np.full((len(symbol_string), 5), -4.0, dtype=np.float32)
    for i, s in enumerate(symbol_string):
        out[i, sym.index(s)] = 4.0
    return out


class TestCallVariants:
    def test_no_variants(self):
        draft = "ACGT"
        logits = _logits_for("ACGT")
        v = call_variants(draft, "c", logits, np.arange(4), np.zeros(4, np.int64))
        assert v == []

    def test_substitution(self):
        draft = "ACGT"
        logits = _logits_for("ATGT")
        v = call_variants(draft, "c", logits, np.arange(4), np.zeros(4, np.int64))
        assert len(v) == 1
        assert (v[0].pos, v[0].ref, v[0].alts) == (1, "C", ["T"])
        assert v[0].qual > 20

    def test_deletion(self):
        draft = "ACGT"
        logits = _logits_for("A*GT")  # model deletes the C
        v = call_variants(draft, "c", logits, np.arange(4), np.zeros(4, np.int64))
        assert len(v) == 1
        assert (v[0].pos, v[0].ref, v[0].alts) == (0, "AC", ["A"])

    def test_insertion_at_minor(self):
        draft = "ACGT"
        # pileup columns: 0, 1, 1.1 (insertion), 2, 3; model calls T at 1.1
        logits = _logits_for("ACTGT")
        majors = np.array([0, 1, 1, 2, 3])
        minors = np.array([0, 0, 1, 0, 0])
        v = call_variants(draft, "c", logits, majors, minors)
        assert len(v) == 1
        assert (v[0].pos, v[0].ref, v[0].alts) == (1, "C", ["CT"])


class TestVcfWriter:
    def test_output_format(self):
        buf = io.StringIO()
        w = VcfWriter(buf, [("chr1", 1000)])
        draft = "ACGT"
        logits = _logits_for("ATGT")
        for v in call_variants(draft, "chr1", logits, np.arange(4), np.zeros(4, np.int64)):
            w.write(v)
        text = buf.getvalue()
        assert text.startswith("##fileformat=VCFv4.1")
        assert "##contig=<ID=chr1,length=1000>" in text
        body = [l for l in text.splitlines() if not l.startswith("#")]
        assert len(body) == 1
        f = body[0].split("\t")
        assert f[0] == "chr1" and f[1] == "2" and f[3] == "C" and f[4] == "T"
        assert f[8] == "GT:GQ"


def _probs_for(symbol_string):
    sym = "*ACGT"
    out = np.full((len(symbol_string), 5), 0.02, dtype=np.float64)
    for i, s in enumerate(symbol_string):
        out[i, sym.index(s)] = 0.92
    return out


class TestNormalization:
    def test_left_aligned_deletion(self):
        """A deletion in a homopolymer is left-aligned
        (variant_calling.cpp normalize_variant trim_end_and_align)."""
        from dorado_tpu.secondary.variant import decode_variants

        draft = "ACCCG"
        v = decode_variants(
            draft, "c", _probs_for("ACC*G"), np.arange(5), np.zeros(5, np.int64)
        )
        assert len(v) == 1
        assert (v[0].pos, v[0].ref, v[0].alts) == (0, "AC", ["A"])

    def test_lowqual_filter(self):
        """QUAL below min_qual marks the record LowQual, not PASS
        (normalize_genotype, variant_calling.cpp:678)."""
        from dorado_tpu.secondary.variant import decode_variants

        draft = "ACGT"
        probs = np.full((4, 5), 0.2, dtype=np.float64)
        probs[1, 4] = 0.21  # T barely wins over draft C
        vs = decode_variants(draft, "c", probs, np.arange(4), np.zeros(4, np.int64))
        assert len(vs) == 1
        assert vs[0].filter == "LowQual"
        assert vs[0].qual < 3.0

    def test_separate_variants_stay_separate(self):
        from dorado_tpu.secondary.variant import decode_variants

        draft = "ACGTA"
        vs = decode_variants(
            draft, "c", _probs_for("ATGAA"), np.arange(5), np.zeros(5, np.int64)
        )
        assert len(vs) == 2
        assert [(v.pos, v.ref, v.alts[0]) for v in vs] == [(1, "C", "T"), (3, "T", "A")]


class TestGvcf:
    def test_ref_records_scored_from_model(self):
        """gVCF reference records carry GQ from the model's reference
        probability (compute_ref_quality), not a constant."""
        from dorado_tpu.secondary.variant import decode_variants

        draft = "ACGT"
        probs = _probs_for("ACGT")
        probs[2, :] = 0.195
        probs[2, 3] = 0.22  # G barely wins: still hom-ref, but uncertain
        vs = decode_variants(
            draft, "c", probs, np.arange(4), np.zeros(4, np.int64), return_all=True
        )
        assert len(vs) == 4
        assert all(v.alts == ["."] and v.filter == "." for v in vs)
        gts = [dict(v.genotype)["GT"] for v in vs]
        assert gts == ["0"] * 4
        gqs = [int(dict(v.genotype)["GQ"]) for v in vs]
        # confident columns score high, the uncertain column scores low
        assert gqs[0] > 9 and gqs[2] < 2

    def test_gvcf_includes_variants(self):
        from dorado_tpu.secondary.variant import decode_variants

        draft = "ACGT"
        vs = decode_variants(
            draft, "c", _probs_for("ATGT"), np.arange(4), np.zeros(4, np.int64),
            return_all=True,
        )
        # every major column gets a ref record (variant_calling.cpp:1090
        # loops all positions), plus the variant record itself
        assert sum(1 for v in vs if v.alts != ["."]) == 1
        assert sum(1 for v in vs if v.alts == ["."]) == 4
