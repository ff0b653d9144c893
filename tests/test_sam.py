"""BAM/SAM writer tests: BGZF round-trip via gzip, binary record parse-back."""

import gzip
import io
import struct

import numpy as np

from dorado_tpu.io.bgzf import BGZF_EOF, BgzfWriter
from dorado_tpu.io.sam import (
    BamWriter,
    FastqWriter,
    SamHeader,
    SamRecord,
    SamTag,
    SamWriter,
    encode_bam_record,
)


def make_record():
    return SamRecord(
        qname="read-0001",
        seq="ACGTACGTNA",
        qual="IIIIIIIII5",
        tags=[
            SamTag("qs", "f", 12.5),
            SamTag("du", "f", 1.25),
            SamTag("ns", "i", 5000),
            SamTag("ts", "i", 10),
            SamTag("mx", "i", 1),
            SamTag("ch", "i", 109),
            SamTag("st", "Z", "2024-01-01T00:00:00.000+00:00"),
            SamTag("rn", "i", 7),
            SamTag("fn", "Z", "file.pod5"),
            SamTag("sm", "f", 91.88),
            SamTag("sd", "f", 22.65),
            SamTag("sv", "Z", "pa"),
            SamTag("dx", "i", 0),
            SamTag("RG", "Z", "runid_model"),
            SamTag("mv", "B", np.array([6, 1, 0, 1], dtype=np.uint8), subtype="c"),
        ],
    )


class TestBgzf:
    def test_roundtrip_and_eof(self):
        buf = io.BytesIO()
        w = BgzfWriter(buf)
        payload = b"hello bgzf " * 20000  # spans multiple blocks
        w.write(payload)
        w.close()
        data = buf.getvalue()
        assert data.endswith(BGZF_EOF)
        assert gzip.decompress(data) == payload

    def test_block_size_field(self):
        buf = io.BytesIO()
        w = BgzfWriter(buf)
        w.write(b"x" * 100)
        w.close()
        data = buf.getvalue()
        # first block: BSIZE extra field at offset 16 == total block len - 1
        bsize = struct.unpack_from("<H", data, 16)[0]
        # walk to second block (EOF marker)
        assert data[bsize + 1 :] == BGZF_EOF


class TestBamWriter:
    def test_bam_parse_back(self, tmp_path):
        header = SamHeader(
            programs=[{"ID": "basecaller", "PN": "dorado_tpu", "VN": "0.1.0"}],
            read_groups=[{"ID": "runid_model", "PL": "ONT", "SM": "sample"}],
        )
        rec = make_record()
        path = tmp_path / "out.bam"
        with open(path, "wb") as fh:
            w = BamWriter(fh, header)
            w.write(rec)
            w.close()

        raw = gzip.decompress(path.read_bytes())
        assert raw[:4] == b"BAM\x01"
        l_text = struct.unpack_from("<i", raw, 4)[0]
        text = raw[8 : 8 + l_text].decode()
        assert "@PG" in text and "ID:runid_model" in text
        off = 8 + l_text
        n_ref = struct.unpack_from("<i", raw, off)[0]
        assert n_ref == 0
        off += 4
        block_size = struct.unpack_from("<I", raw, off)[0]
        body = raw[off + 4 : off + 4 + block_size]
        refid, pos, l_rn, mapq, bin_, n_cig, flag, l_seq = struct.unpack_from(
            "<iiBBHHHi", body, 0
        )
        assert refid == -1 and pos == -1 and flag == 4
        assert l_seq == 10
        name = body[32 : 32 + l_rn - 1].decode()
        assert name == "read-0001"
        seq_off = 32 + l_rn + 4 * n_cig
        nib = body[seq_off : seq_off + (l_seq + 1) // 2]
        decode = "=ACMGRSVTWYHKDBN"
        seq = "".join(
            decode[(b >> 4) if i % 2 == 0 else (b & 0xF)]
            for i in range(l_seq)
            for b in [nib[i // 2]]
        )
        assert seq == "ACGTACGTNA"
        qual = body[seq_off + (l_seq + 1) // 2 :][:l_seq]
        assert bytes(qual) == bytes(ord(c) - 33 for c in "IIIIIIIII5")
        aux = body[seq_off + (l_seq + 1) // 2 + l_seq :]
        assert b"qs" in aux and b"mv" in aux and b"RG" in aux
        # mv array: tag 'mv', 'B', 'c', count=4, data
        i = aux.index(b"mvBc")
        count = struct.unpack_from("<I", aux, i + 4)[0]
        assert count == 4
        assert list(aux[i + 8 : i + 12]) == [6, 1, 0, 1]

    def test_sam_line(self):
        rec = make_record()
        line = rec.to_sam_line()
        fields = line.split("\t")
        assert fields[0] == "read-0001"
        assert fields[1] == "4"
        assert fields[9] == "ACGTACGTNA"
        assert "mv:B:c,6,1,0,1" in line
        assert "qs:f:12.5" in line
        assert "sv:Z:pa" in line

    def test_sam_writer(self):
        out = io.StringIO()
        w = SamWriter(out, SamHeader())
        w.write(make_record())
        text = out.getvalue()
        assert text.startswith("@HD\tVN:1.6")
        assert "read-0001" in text

    def test_fastq_writer(self):
        out = io.StringIO()
        w = FastqWriter(out)
        w.write(make_record())
        lines = out.getvalue().strip().split("\n")
        assert lines[0].startswith("@read-0001")
        assert lines[1] == "ACGTACGTNA"
        assert lines[2] == "+"
        assert lines[3] == "IIIIIIIII5"
