"""CRAM 3.0 writer/reader round-trips + structural parse of the reference's
htslib-written fixtures (regression_test/ref/linux/.../out.cram)."""

import io
from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.io.cram import (
    ByteReader,
    CramReader,
    CramWriter,
    scan_structure,
    write_itf8,
    write_ltf8,
)
from dorado_tpu.io.sam import SamHeader, SamRecord, SamTag

REF_CRAMS = sorted(
    Path("/root/reference/regression_test/ref/linux").rglob("*.cram")
)


class TestVarints:
    @pytest.mark.parametrize(
        "v", [0, 1, 127, 128, 16383, 16384, 2097151, 2**27, 2**31 - 1, -1, -100]
    )
    def test_itf8_roundtrip(self, v):
        r = ByteReader(write_itf8(v))
        assert r.itf8() == v

    @pytest.mark.parametrize(
        "v", [0, 127, 128, 2**20, 2**35, 2**50, 2**62, -1]
    )
    def test_ltf8_roundtrip(self, v):
        r = ByteReader(write_ltf8(v))
        assert r.ltf8() == v


def _header(with_refs=False):
    return SamHeader(
        references=[("chr1", 10000), ("chr2", 5000)] if with_refs else [],
        read_groups=[{"ID": "run1_model", "PU": "TEST", "PL": "ONT"}],
        programs=[{"ID": "basecaller", "PN": "dorado_tpu"}],
    )


def _unmapped_records(n=10, seed=0):
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        ln = int(rng.randint(5, 200))
        seq = "".join(rng.choice(list("ACGT"), ln))
        qual = "".join(chr(int(q) + 33) for q in rng.randint(0, 50, ln))
        tags = [
            SamTag("qs", "f", float(round(float(rng.rand() * 30), 3))),
            SamTag("ns", "i", int(rng.randint(0, 100000))),
            SamTag("RG", "Z", "run1_model"),
            SamTag("mv", "B", rng.randint(0, 2, 20).astype(np.uint8), subtype="c"),
        ]
        recs.append(
            SamRecord(qname=f"read-{i}", flag=4, seq=seq, qual=qual, tags=tags)
        )
    return recs


class TestRoundTrip:
    def test_unmapped(self, tmp_path):
        path = tmp_path / "t.cram"
        recs = _unmapped_records(25)
        with open(path, "wb") as f:
            w = CramWriter(f, _header())
            for r in recs:
                w.write(r)
            w.close()

        rd = CramReader(path)
        assert "@RG" in rd.header_text
        got = list(rd.records())
        assert len(got) == len(recs)
        for a, b in zip(recs, got):
            assert b.qname == a.qname
            assert b.flag == a.flag
            assert b.seq == a.seq
            assert b.qual == a.qual
            want_tags = {t.tag: t for t in a.tags}
            got_tags = {t.tag: t for t in b.tags}
            assert set(got_tags) == set(want_tags)
            assert got_tags["qs"].value == pytest.approx(want_tags["qs"].value)
            assert got_tags["ns"].value == want_tags["ns"].value
            assert got_tags["RG"].value == want_tags["RG"].value
            np.testing.assert_array_equal(
                got_tags["mv"].value, want_tags["mv"].value
            )

    def test_mapped_with_cigar(self, tmp_path):
        path = tmp_path / "m.cram"
        recs = [
            SamRecord(
                qname="m1", flag=0, rname="chr1", pos=100, mapq=60,
                cigar="5S10M2I8M3D7M", seq="ACGTACGTACGTACGTACGTACGTACGTACGT",
                qual="I" * 32, tags=[SamTag("NM", "i", 5)],
            ),
            SamRecord(
                qname="m2", flag=16, rname="chr2", pos=500, mapq=30,
                cigar="20M", seq="A" * 20, qual="5" * 20, tags=[],
            ),
            SamRecord(qname="u1", flag=4, seq="ACGT", qual="IIII", tags=[]),
        ]
        with open(path, "wb") as f:
            w = CramWriter(f, _header(with_refs=True))
            for r in recs:
                w.write(r)
            w.close()
        got = list(CramReader(path).records())
        assert len(got) == 3
        for a, b in zip(recs, got):
            assert (b.qname, b.flag, b.rname, b.pos, b.mapq) == (
                a.qname, a.flag, a.rname, a.pos, a.mapq
            )
            assert b.cigar == a.cigar
            assert b.seq == a.seq
            assert b.qual == a.qual

    def test_multi_slice(self, tmp_path):
        from dorado_tpu.io import cram as cram_mod

        old = cram_mod._SEQS_PER_SLICE
        cram_mod._SEQS_PER_SLICE = 7
        try:
            path = tmp_path / "s.cram"
            recs = _unmapped_records(23, seed=3)
            with open(path, "wb") as f:
                w = CramWriter(f, _header())
                for r in recs:
                    w.write(r)
                w.close()
            got = list(CramReader(path).records())
            assert [g.qname for g in got] == [r.qname for r in recs]
            assert [g.seq for g in got] == [r.seq for r in recs]
        finally:
            cram_mod._SEQS_PER_SLICE = old

    def test_empty(self, tmp_path):
        path = tmp_path / "e.cram"
        with open(path, "wb") as f:
            w = CramWriter(f, _header())
            w.close()
        st = scan_structure(path)
        assert st["eof"] and st["records"] == 0
        assert list(CramReader(path).records()) == []


class TestCliCram:
    def test_basecaller_cram_output(self, tmp_path):
        """basecaller -o out.cram emits CRAM readable by our own reader
        (reference selects OutputMode::CRAM from the extension,
        hts_utils/sequence_file_format.cpp)."""
        import os
        import shutil
        import subprocess
        import sys

        import jax

        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.crf_model import init_lstm_crf_params
        from dorado_tpu.models.load import save_lstm_params

        repo = Path(__file__).resolve().parent.parent
        fast = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
        cfg_src = Path("/root/reference/tests/data/model_configs") / fast
        pod5 = Path("/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz")
        if not cfg_src.exists() or not pod5.exists():
            pytest.skip("reference fixtures unavailable")
        d = tmp_path / fast
        d.mkdir()
        shutil.copy(cfg_src / "config.toml", d / "config.toml")
        cfg = load_model_config(d)
        save_lstm_params(cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(0)), d)

        out = tmp_path / "calls.cram"
        env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(repo)}
        r = subprocess.run(
            [sys.executable, "-m", "dorado_tpu", "basecaller", str(d), str(pod5),
             "--decoder", "viterbi", "-b", "4", "-c", "4000", "-o", str(out)],
            capture_output=True, text=True, timeout=400, cwd=repo, env=env,
        )
        assert r.returncode == 0, r.stderr
        rd = CramReader(out)
        recs = list(rd.records())
        assert len(recs) == 3
        for rec in recs:
            assert rec.flag & 0x4
            tag_names = {t.tag for t in rec.tags}
            assert {"qs", "ns", "RG"} <= tag_names
        assert "@PG" in rd.header_text


@pytest.mark.skipif(not REF_CRAMS, reason="no reference CRAM fixtures")
class TestReferenceFixtures:
    """The container/block framing must walk htslib's own files cleanly."""

    def test_structural_parse(self):
        for p in REF_CRAMS:
            st = scan_structure(p)
            assert st["version"][0] == 3
            assert st["eof"], f"no EOF container in {p}"
            assert st["records"] > 0
            assert st["containers"] >= 1


def test_read_records_dispatches_cram(tmp_path):
    """read_records (summary/aligner/demux input path) auto-detects CRAM by
    magic, like htslib's format sniffing."""
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.cram import CramWriter
    from dorado_tpu.io.sam import SamHeader, SamRecord

    header = SamHeader()
    path = tmp_path / "x.cram"
    with open(path, "wb") as fh:
        w = CramWriter(fh, header)
        w.write(SamRecord(qname="r0", flag=4, seq="ACGTACGT", qual="IIIIIIII"))
        w.close()
    text, records = read_records(path)
    assert len(records) == 1 and records[0].qname == "r0"
    assert records[0].seq == "ACGTACGT"


class TestRansWriter:
    """CramWriter(rans=True): data-series blocks compressed with the
    io/rans.py 4x8 coders (htslib's CRAM 3.0 default codec)."""

    def _records(self, n=64):
        import random

        rng = random.Random(7)
        recs = []
        for i in range(n):
            seq = "".join(rng.choice("ACGT") for _ in range(rng.randint(80, 220)))
            qual = "".join(chr(33 + rng.randint(2, 40)) for _ in seq)
            recs.append(
                SamRecord(qname=f"read{i}", flag=4, seq=seq, qual=qual)
            )
        return recs

    def test_roundtrip_and_uses_rans_blocks(self, tmp_path):
        import io as _io

        from dorado_tpu.io.cram import RANS4x8, CramReader, CramWriter

        recs = self._records()
        buf = _io.BytesIO()
        w = CramWriter(buf, _header(), rans=True)
        for r in recs:
            w.write(r)
        w.close()
        data = buf.getvalue()
        back = list(CramReader(data).records())
        assert [(r.qname, r.seq, r.qual) for r in back] == [
            (r.qname, r.seq, r.qual) for r in recs
        ]
        # at least one block must actually carry the rANS method byte
        # (method RANS4x8 = 4, content type EXTERNAL = 4); cheap scan:
        # count via the reader's own block walk
        from dorado_tpu.io.cram import ByteReader, read_block, read_container_header

        r = ByteReader(data)
        r.read(26)  # magic + version + file id
        methods = []
        while r.pos < len(data) - 38:
            ch = read_container_header(r)
            end = r.pos + ch.length
            while r.pos < end:
                start = r.pos
                methods.append(r.data[start])
                read_block(r)
        assert RANS4x8 in methods

    def test_rans_output_smaller_than_gzip(self):
        import io as _io

        from dorado_tpu.io.cram import CramWriter

        recs = self._records(256)
        outs = {}
        for rans in (False, True):
            buf = _io.BytesIO()
            w = CramWriter(buf, _header(), rans=rans)
            for r in recs:
                w.write(r)
            w.close()
            outs[rans] = len(buf.getvalue())
        assert outs[True] < outs[False], outs


class TestReferenceBasedMode:
    """RR=true slices (htslib's default for aligned output): mapped reads
    store only differences from the reference; the reader reconstructs
    bases, CIGAR and missing MD/NM from ref_seqs."""

    def _ref(self, n=50000, seed=0):
        rng = np.random.RandomState(seed)
        return "".join("ACGT"[i] for i in rng.randint(0, 4, n))

    def _header(self, ref):
        h = SamHeader()
        h.references = [("chr1", len(ref))]
        return h

    def test_substitutions_roundtrip_and_md_nm(self):
        import io as _io

        rng = np.random.RandomState(1)
        ref = self._ref()
        recs = []
        for i in range(40):
            pos = int(rng.randint(1, 40000))
            seq = list(ref[pos - 1 : pos - 1 + 2000])
            for k in rng.choice(2000, 3, replace=False):
                seq[k] = "ACGT"[("ACGT".index(seq[k]) + 1) % 4]
            recs.append(
                SamRecord(
                    qname=f"r{i}", flag=0, rname="chr1", pos=pos, mapq=60,
                    cigar="2000M", seq="".join(seq), qual="I" * 2000,
                )
            )
        buf = _io.BytesIO()
        w = CramWriter(buf, self._header(ref), ref_seqs={"chr1": ref})
        for r in recs:
            w.write(r)
        w.close()
        back = list(CramReader(buf.getvalue(), ref_seqs={"chr1": ref}).records())
        assert len(back) == len(recs)
        for a, b in zip(recs, back):
            assert (a.seq, a.cigar, a.pos) == (b.seq, b.cigar, b.pos)
            assert next(t.value for t in b.tags if t.tag == "NM") == 3
            md = next(t.value for t in b.tags if t.tag == "MD")
            assert md.count("A") + md.count("C") + md.count("G") + md.count("T") == 3

    def test_indels_softclips_roundtrip(self):
        import io as _io

        ref = self._ref(1000)
        seq = ("GGGGG" + ref[99:144] + "TTTT" + ref[144:184]
               + ref[190:196] + "AAAA")
        rec = SamRecord(
            qname="x", flag=0, rname="chr1", pos=100, mapq=60,
            cigar="5S45M4I40M6D6M4S", seq=seq, qual="I" * len(seq),
        )
        buf = _io.BytesIO()
        w = CramWriter(buf, self._header(ref), ref_seqs={"chr1": ref})
        w.write(rec)
        w.close()
        b = next(CramReader(buf.getvalue(), ref_seqs={"chr1": ref}).records())
        assert b.seq == rec.seq and b.cigar == rec.cigar
        assert next(t.value for t in b.tags if t.tag == "NM") == 10  # 4I + 6D
        assert next(t.value for t in b.tags if t.tag == "MD") == "85^" + ref[184:190] + "6"

    def test_reference_mode_much_smaller(self):
        """Low-divergence alignments: RR=true must be several-fold smaller
        than verbatim mode (the point of htslib's default)."""
        import io as _io

        rng = np.random.RandomState(2)
        ref = self._ref()
        recs = []
        for i in range(50):
            pos = int(rng.randint(1, 40000))
            recs.append(
                SamRecord(
                    qname=f"r{i}", flag=0, rname="chr1", pos=pos, mapq=60,
                    cigar="2000M", seq=ref[pos - 1 : pos - 1 + 2000],
                    qual="I" * 2000,
                )
            )

        def size(ref_seqs):
            buf = _io.BytesIO()
            w = CramWriter(buf, self._header(ref), ref_seqs=ref_seqs)
            for r in recs:
                w.write(r)
            w.close()
            return len(buf.getvalue())

        assert size(None) > 4 * size({"chr1": ref})

    def test_rr_slice_carries_reference_md5(self):
        import hashlib
        import io as _io

        from dorado_tpu.io.cram import (
            COMPRESSION_HEADER, SLICE_HEADER, ByteReader, CRAM_MAGIC,
            parse_slice_header, read_block, read_container_header,
        )

        ref = self._ref(2000)
        rec = SamRecord(
            qname="x", flag=0, rname="chr1", pos=11, mapq=60,
            cigar="100M", seq=ref[10:110], qual="I" * 100,
        )
        buf = _io.BytesIO()
        w = CramWriter(buf, self._header(ref), ref_seqs={"chr1": ref})
        w.write(rec)
        w.close()
        r = ByteReader(buf.getvalue())
        assert r.read(4) == CRAM_MAGIC
        r.read(2 + 20)
        ch = read_container_header(r)  # header container
        r.pos += ch.length
        read_container_header(r)
        blk = read_block(r)
        assert blk.ctype == COMPRESSION_HEADER
        blk = read_block(r)
        assert blk.ctype == SLICE_HEADER
        sh = parse_slice_header(blk.data)
        assert sh.start == 11 and sh.span == 100
        assert sh.md5 == hashlib.md5(ref[10:110].encode()).digest()

    def test_missing_reference_raises(self):
        import io as _io

        ref = self._ref(500)
        rec = SamRecord(
            qname="x", flag=0, rname="chr1", pos=1, mapq=60,
            cigar="100M", seq=ref[:100], qual="I" * 100,
        )
        buf = _io.BytesIO()
        w = CramWriter(buf, self._header(ref), ref_seqs={"chr1": ref})
        w.write(rec)
        w.close()
        with pytest.raises(ValueError, match="ref_seqs"):
            list(CramReader(buf.getvalue()).records())


class TestComputeMdNm:
    def test_spec_example(self):
        from dorado_tpu.io.cram import compute_md_nm

        ref = "CAGTACGTACGT"
        #       ||x||   (pos 2, 5M: AGxAC vs ref AGTAC)
        md, nm = compute_md_nm("AGCAC", "5M", ref, 2)
        assert (md, nm) == ("2T2", 1)
        md, nm = compute_md_nm("AGTA" + "GG" + "CGT", "4M2I3M", ref, 2)
        assert (md, nm) == ("7", 2)
        md, nm = compute_md_nm("AGTA" + "TAC", "4M2D3M", ref, 2)
        assert (md, nm) == ("4^CG3", 2)


class TestGoldenHtslibSizeParity:
    """Re-emitting the reference's htslib-written CRAM records through this
    writer (rANS default) must land within 1.5x of htslib's size."""

    def test_size_within_budget(self):
        p = Path(
            "/root/reference/regression_test/ref/linux/basecalling/"
            "Kit14_hac_cram/out.cram"
        )
        if not p.exists():
            pytest.skip("reference golden CRAM not available")
        import io as _io

        rd = CramReader(p)
        recs = list(rd.records())
        assert len(recs) == 20
        header = SamHeader()
        for line in rd.header_text.splitlines():
            if line.startswith("@RG"):
                header.read_groups.append(
                    {f[:2]: f[3:] for f in line.split("\t")[1:]}
                )
        buf = _io.BytesIO()
        w = CramWriter(buf, header, rans=True)
        for r in recs:
            w.write(r)
        w.close()
        ratio = len(buf.getvalue()) / p.stat().st_size
        assert ratio < 1.5, ratio
        # and it round-trips
        back = list(CramReader(buf.getvalue()).records())
        assert [(r.qname, r.seq, r.qual) for r in back] == [
            (r.qname, r.seq, r.qual) for r in recs
        ]


class TestReferenceBasedEdgeCases:
    def _setup(self, n=1000):
        rng = np.random.RandomState(3)
        ref = "".join("ACGT"[i] for i in rng.randint(0, 4, n))
        h = SamHeader()
        h.references = [("chr1", len(ref))]
        return ref, h

    def test_mapped_record_without_seq(self):
        """Secondary alignments are written with SEQ '*' but a real CIGAR
        (cli aligner semantics); the RR writer must not crash on them."""
        import io as _io

        ref, h = self._setup()
        recs = [
            SamRecord(
                qname="pri", flag=0, rname="chr1", pos=100, mapq=60,
                cigar="100M", seq=ref[99:199], qual="I" * 100,
            ),
            SamRecord(
                qname="sec", flag=0x100, rname="chr1", pos=300, mapq=0,
                cigar="10S90M", seq="*", qual="*",
            ),
        ]
        buf = _io.BytesIO()
        w = CramWriter(buf, h, ref_seqs={"chr1": ref})
        for r in recs:
            w.write(r)
        w.close()
        back = list(CramReader(buf.getvalue(), ref_seqs={"chr1": ref}).records())
        assert back[0].seq == recs[0].seq and back[0].cigar == "100M"
        # CF_NO_SEQ: SEQ decodes as '*', the alignment structure survives
        assert back[1].flag == 0x100 and back[1].seq == "*"
        assert back[1].cigar == "10S90M"
        assert back[1].pos == 300

    def test_hard_clip_order_roundtrips(self):
        """'90M10H' must not decode as '10H90M' (the implicit-match fill
        has to run before clip/pad feature ops)."""
        import io as _io

        ref, h = self._setup()
        for cigar, seq in [
            ("90M10H", ref[99:189]),
            ("10H90M", ref[99:189]),
            ("40M5P50M", ref[99:139] + ref[139:189]),
        ]:
            rec = SamRecord(
                qname="x", flag=0, rname="chr1", pos=100, mapq=60,
                cigar=cigar, seq=seq, qual="I" * len(seq),
            )
            buf = _io.BytesIO()
            w = CramWriter(buf, h, ref_seqs={"chr1": ref})
            w.write(rec)
            w.close()
            b = next(CramReader(buf.getvalue(), ref_seqs={"chr1": ref}).records())
            assert b.cigar == cigar, (cigar, b.cigar)
            assert b.seq == seq
