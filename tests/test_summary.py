"""BAM reader round-trip + sequencing summary generation."""

import io

import numpy as np

from dorado_tpu.io.bam_reader import read_bam, read_records
from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord, SamTag, SamWriter
from dorado_tpu.io.summary import write_summary


def _record(qname="read1"):
    return SamRecord(
        qname=qname,
        seq="ACGTACGT",
        qual="IIIIIIII",
        tags=[
            SamTag("qs", "f", 12.5),
            SamTag("du", "f", 0.5),
            SamTag("ns", "i", 2500),
            SamTag("ts", "i", 10),
            SamTag("mx", "i", 2),
            SamTag("ch", "i", 103),
            SamTag("st", "Z", "2024-01-01T00:00:00.000000+00:00"),
            SamTag("rn", "i", 7),
            SamTag("fn", "Z", "file.pod5"),
            SamTag("RG", "Z", "runabc_model@v1"),
            SamTag("mv", "B", np.array([5, 1, 0, 1], dtype=np.int8), subtype="c"),
        ],
    )


def _header():
    h = SamHeader()
    h.read_groups.append(
        {
            "ID": "runabc_model@v1",
            "PL": "ONT",
            "DS": "runid=runabc basecall_model=model@v1",
        }
    )
    return h


class TestBamRoundtrip:
    def test_write_read(self, tmp_path):
        path = tmp_path / "t.bam"
        with open(path, "wb") as fh:
            w = BamWriter(fh, _header())
            w.write(_record("a"))
            w.write(_record("b"))
            w.close()
        bam = read_bam(path)
        assert len(bam.records) == 2
        rec = bam.records[0]
        assert rec.qname == "a"
        assert rec.seq == "ACGTACGT"
        assert rec.qual == "IIIIIIII"
        tags = {t.tag: t for t in rec.tags}
        assert abs(tags["qs"].value - 12.5) < 1e-6
        assert tags["ch"].value == 103
        assert tags["mv"].value.tolist() == [5, 1, 0, 1]
        assert "@RG" in bam.header_text

    def test_read_records_sam(self, tmp_path):
        path = tmp_path / "t.sam"
        with open(path, "w") as fh:
            w = SamWriter(fh, _header())
            w.write(_record("x"))
            w.close()
        header, records = read_records(path)
        assert "@RG" in header
        assert records[0].qname == "x"
        tags = {t.tag: t.value for t in records[0].tags}
        assert tags["ch"] == 103


class TestSummary:
    def test_columns_and_values(self, tmp_path):
        path = tmp_path / "t.bam"
        with open(path, "wb") as fh:
            w = BamWriter(fh, _header())
            w.write(_record())
            w.close()
        header, records = read_records(path)
        buf = io.StringIO()
        n = write_summary(records, buf, header_text=header)
        assert n == 1
        lines = buf.getvalue().splitlines()
        cols = lines[0].split("\t")
        vals = dict(zip(cols, lines[1].split("\t")))
        assert vals["read_id"] == "read1"
        assert vals["run_id"] == "runabc"
        assert vals["channel"] == "103"
        assert vals["mux"] == "2"
        assert vals["sequence_length_template"] == "8"
        assert float(vals["duration"]) == 0.5
        # events = (ns - ts) / stride(from mv tag)
        assert vals["num_events_template"] == str((2500 - 10) // 5)
        assert float(vals["mean_qscore_template"]) == 12.5

    def test_skips_secondary(self):
        rec = _record()
        rec.flag = 0x100
        buf = io.StringIO()
        assert write_summary([rec], buf) == 0


def test_alignment_columns(tmp_path):
    """Aligned input grows the alignment_* column group
    (SummaryFileWriter.cpp:60-80)."""
    import io as _io

    from dorado_tpu.io.sam import SamRecord, SamTag
    from dorado_tpu.io.summary import write_summary

    rec = SamRecord(
        qname="r0", seq="A" * 100, qual="I" * 100,
        rname="ctg", pos=11, mapq=60, flag=0, cigar="5S90M2I3S",
        tags=[SamTag("NM", "i", 4), SamTag("AS", "i", 85), SamTag("bh", "i", 2)],
    )
    buf = _io.StringIO()
    write_summary([rec], buf)
    header, row = buf.getvalue().splitlines()
    cols = dict(zip(header.split("\t"), row.split("\t")))
    assert cols["alignment_genome"] == "ctg"
    assert cols["alignment_genome_start"] == "10"
    assert cols["alignment_genome_end"] == "100"  # 10 + 90M
    assert cols["alignment_strand_start"] == "5"
    assert cols["alignment_strand_end"] == "97"
    assert cols["alignment_num_insertions"] == "2"
    assert cols["alignment_num_aligned"] == "90"
    # NM=4 incl. 2 ins -> 2 mismatches -> 88 correct
    assert cols["alignment_num_correct"] == "88"
    assert cols["alignment_bed_hits"] == "2"
    assert cols["alignment_mapping_quality"] == "60"
