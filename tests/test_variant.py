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
