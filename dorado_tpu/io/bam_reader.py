"""BAM/SAM reading: BGZF inflation, record decoding, aux-tag parsing.

From-scratch counterpart of the reference's htslib usage
(dorado/read_pipeline/base/HtsReader.cpp): enough of the BAM spec to read
back our own (and dorado's) unaligned BAM output for summary, resume and
demux flows.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import numpy as np

from dorado_tpu.io.sam import SamRecord, SamTag

_SEQ_LUT = "=ACMGRSVTWYHKDBN"
_SEQ_LUT_BYTES = np.frombuffer(_SEQ_LUT.encode(), np.uint8)
_CIGAR_OPS = "MIDNSHP=X"


def bgzf_decompress(data: bytes) -> bytes:
    """Inflate a BGZF file (sequence of gzip members with BC extra field)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad BGZF magic")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2 = extra[epos], extra[epos + 1]
            slen = struct.unpack_from("<H", extra, epos + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, epos + 4)[0] + 1
            epos += 4 + slen
        if bsize is None:
            raise ValueError("missing BGZF BC field")
        cdata = data[pos + 12 + xlen : pos + bsize - 8]
        if cdata:
            out += zlib.decompress(cdata, -15)
        pos += bsize
    return bytes(out)


def _parse_aux(aux: bytes) -> list[SamTag]:
    tags = []
    p = 0
    n = len(aux)
    while p < n:
        tag = aux[p : p + 2].decode()
        typ = chr(aux[p + 2])
        p += 3
        if typ == "Z" or typ == "H":
            end = aux.index(0, p)
            tags.append(SamTag(tag, "Z", aux[p:end].decode()))
            p = end + 1
        elif typ == "A":
            tags.append(SamTag(tag, "A", chr(aux[p])))
            p += 1
        elif typ == "f":
            tags.append(SamTag(tag, "f", struct.unpack_from("<f", aux, p)[0]))
            p += 4
        elif typ in "cCsSiI":
            fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I"}[typ]
            size = struct.calcsize(fmt)
            tags.append(SamTag(tag, typ, struct.unpack_from(fmt, aux, p)[0]))
            p += size
        elif typ == "B":
            sub = chr(aux[p])
            count = struct.unpack_from("<I", aux, p + 1)[0]
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            size = struct.calcsize(fmt)
            vals = np.frombuffer(
                aux[p + 5 : p + 5 + count * size], dtype=np.dtype(fmt).newbyteorder("<")
            ).copy()
            tags.append(SamTag(tag, "B", vals, subtype=sub))
            p += 5 + count * size
        else:
            raise ValueError(f"unsupported aux type {typ!r}")
    return tags


@dataclass
class BamFile:
    header_text: str
    references: list[tuple[str, int]]
    records: list[SamRecord] = field(default_factory=list)


def decode_bam_record(block: bytes) -> SamRecord:
    (
        refid,
        pos,
        l_read_name,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        next_refid,
        next_pos,
        tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", block, 0)
    p = 32
    qname = block[p : p + l_read_name - 1].decode()
    p += l_read_name
    cigar_ops = struct.unpack_from(f"<{n_cigar}I", block, p)
    p += 4 * n_cigar
    cigar = (
        "".join(f"{op >> 4}{_CIGAR_OPS[op & 0xF]}" for op in cigar_ops)
        if n_cigar
        else "*"
    )
    nib = np.frombuffer(block[p : p + (l_seq + 1) // 2], np.uint8)
    p += (l_seq + 1) // 2
    if l_seq:
        lut = _SEQ_LUT_BYTES
        nibs = np.empty(2 * len(nib), np.uint8)
        nibs[0::2] = nib >> 4
        nibs[1::2] = nib & 0xF
        seq = lut[nibs[:l_seq]].tobytes().decode()
    else:
        seq = "*"
    qual_raw = block[p : p + l_seq]
    p += l_seq
    qual = (
        (
            np.minimum(np.frombuffer(qual_raw, np.uint8), 93) + 33
        ).astype(np.uint8).tobytes().decode("latin-1")
        if l_seq and (not qual_raw or qual_raw[0] != 0xFF)
        else "*"
    )
    tags = _parse_aux(block[p:])
    return SamRecord(
        qname=qname,
        flag=flag,
        rname="*" if refid < 0 else str(refid),
        pos=pos + 1,
        mapq=mapq,
        cigar=cigar,
        rnext="*",
        pnext=next_pos + 1,
        tlen=tlen,
        seq=seq,
        qual=qual,
        tags=tags,
    )


def _iter_bgzf_members(fh) -> Iterator[bytes]:
    """Decompress a BGZF stream one gzip member at a time (constant memory)."""
    while True:
        hdr = fh.read(12)
        if not hdr:
            return
        if len(hdr) < 12 or hdr[:2] != b"\x1f\x8b":
            raise ValueError("bad BGZF magic")
        xlen = struct.unpack_from("<H", hdr, 10)[0]
        extra = fh.read(xlen)
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2 = extra[epos], extra[epos + 1]
            slen = struct.unpack_from("<H", extra, epos + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, epos + 4)[0] + 1
            epos += 4 + slen
        if bsize is None:
            raise ValueError("missing BGZF BC field")
        rest = fh.read(bsize - 12 - xlen)
        cdata = rest[:-8]
        if cdata:
            yield zlib.decompress(cdata, -15)


class _BgzfStreamReader:
    """read(n) over the concatenated decompressed BGZF members, holding at
    most one member (≤64 KiB) in memory."""

    def __init__(self, fh):
        self._members = _iter_bgzf_members(fh)
        self._buf = b""
        self._off = 0

    def read(self, n: int) -> bytes:
        parts = []
        need = n
        while need:
            avail = len(self._buf) - self._off
            if avail == 0:
                try:
                    self._buf = next(self._members)
                except StopIteration:
                    break
                self._off = 0
                continue
            take = min(avail, need)
            parts.append(self._buf[self._off : self._off + take])
            self._off += take
            need -= take
        return b"".join(parts)


def stream_bam(fh) -> tuple[str, list[tuple[str, int]], Iterator[SamRecord]]:
    """(header_text, references, lazy record iterator) over an open BAM
    file object; records are decoded one at a time so the whole file is
    never resident (the way htslib's bam_read1 loop behaves)."""
    r = _BgzfStreamReader(fh)
    if r.read(4) != b"BAM\x01":
        raise ValueError("not a BAM file")
    l_text = struct.unpack("<i", r.read(4))[0]
    text = r.read(l_text).decode()
    n_ref = struct.unpack("<i", r.read(4))[0]
    refs = []
    for _ in range(n_ref):
        l_name = struct.unpack("<i", r.read(4))[0]
        name = r.read(l_name)[:-1].decode()
        l_ref = struct.unpack("<i", r.read(4))[0]
        refs.append((name, l_ref))

    def records() -> Iterator[SamRecord]:
        while True:
            raw_size = r.read(4)
            if len(raw_size) < 4:
                return
            block_size = struct.unpack("<i", raw_size)[0]
            rec = decode_bam_record(r.read(block_size))
            if rec.rname != "*":
                idx = int(rec.rname)
                rec.rname = refs[idx][0] if 0 <= idx < len(refs) else "*"
            yield rec

    return text, refs, records()


def iter_bam(path: Path | str) -> Iterator[SamRecord]:
    """Stream records from a BAM path without materialising the file."""
    with open(path, "rb") as fh:
        _, _, records = stream_bam(fh)
        yield from records


def read_bam(path: Path | str) -> BamFile:
    with open(path, "rb") as fh:
        text, refs, records = stream_bam(fh)
        return BamFile(header_text=text, references=refs, records=list(records))


def iter_sam(path: Path | str) -> Iterator[SamRecord]:
    """Stream records from a SAM text file."""
    with open(path) as fh:
        for line in fh:
            if line.startswith("@") or not line.strip():
                continue
            f = line.rstrip("\n").split("\t")
            tags = []
            for tf in f[11:]:
                tag, typ, val = tf.split(":", 2)
                if typ == "i":
                    tags.append(SamTag(tag, "i", int(val)))
                elif typ == "f":
                    tags.append(SamTag(tag, "f", float(val)))
                elif typ == "B":
                    sub, *vals = val.split(",")
                    arr = np.asarray(
                        [float(v) if sub == "f" else int(v) for v in vals]
                    )
                    tags.append(SamTag(tag, "B", arr, subtype=sub))
                else:
                    tags.append(SamTag(tag, typ, val))
            yield SamRecord(
                qname=f[0],
                flag=int(f[1]),
                rname=f[2],
                pos=int(f[3]),
                mapq=int(f[4]),
                cigar=f[5],
                rnext=f[6],
                pnext=int(f[7]),
                tlen=int(f[8]),
                seq=f[9],
                qual=f[10],
                tags=tags,
            )


def read_records(path: Path | str) -> tuple[str, list[SamRecord]]:
    """(header text, records) for a BAM, SAM or CRAM path."""
    path = Path(path)
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"CRAM":
        from dorado_tpu.io.cram import CramReader

        rd = CramReader(path)
        return rd.header_text, list(rd.records())
    magic = magic[:2]
    if magic == b"\x1f\x8b":
        bam = read_bam(path)
        return bam.header_text, bam.records
    header_lines = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("@"):
                header_lines.append(line)
            else:
                break
    return "".join(header_lines), list(iter_sam(path))


class _BgzfRandomReader:
    """Seekable BGZF reader addressed by virtual offsets (coffset<<16|uoffset)
    — the read side of the .bai index (bai.py)."""

    def __init__(self, fh):
        self._fh = fh
        self._payload = b""
        self._coffset = 0  # disk offset of the loaded member
        self._next_coffset = 0
        self._off = 0

    def _load(self, coffset: int) -> bool:
        self._fh.seek(coffset)
        hdr = self._fh.read(12)
        if len(hdr) < 12 or hdr[:2] != b"\x1f\x8b":
            return False
        xlen = struct.unpack_from("<H", hdr, 10)[0]
        extra = self._fh.read(xlen)
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2 = extra[epos], extra[epos + 1]
            slen = struct.unpack_from("<H", extra, epos + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, epos + 4)[0] + 1
            epos += 4 + slen
        if bsize is None:
            return False
        rest = self._fh.read(bsize - 12 - xlen)
        cdata = rest[:-8]
        self._payload = zlib.decompress(cdata, -15) if cdata else b""
        self._coffset = coffset
        self._next_coffset = coffset + bsize
        self._off = 0
        return bool(self._payload)

    def seek_voffset(self, v: int) -> bool:
        if not self._load(v >> 16):
            return False
        self._off = v & 0xFFFF
        return self._off <= len(self._payload)

    def voffset(self) -> int:
        if self._off >= len(self._payload):
            return self._next_coffset << 16
        return (self._coffset << 16) | self._off

    def read(self, n: int) -> bytes:
        parts = []
        need = n
        while need:
            avail = len(self._payload) - self._off
            if avail == 0:
                if not self._load(self._next_coffset):
                    break
                continue
            take = min(avail, need)
            parts.append(self._payload[self._off : self._off + take])
            self._off += take
            need -= take
        return b"".join(parts)


def fetch_region(
    path: Path | str, rname: str, beg: int, end: int, bai_path: Path | str | None = None
) -> list[SamRecord]:
    """Records overlapping [beg, end) (0-based half-open) on ``rname``,
    located through the .bai index — samtools-view region semantics over
    this module's own readers."""
    from dorado_tpu.io.bai import cigar_ref_span, query_chunks, read_bai

    path = Path(path)
    bai_path = Path(bai_path) if bai_path else Path(str(path) + ".bai")
    with open(path, "rb") as fh:
        _, refs, _ = stream_bam(fh)
    names = [n for n, _ in refs]
    tid = names.index(rname)
    with open(bai_path, "rb") as fh:
        bins, linear, _ = read_bai(fh)
    chunks = query_chunks(bins.get(tid, {}), linear.get(tid, []), beg, end)

    out: list[SamRecord] = []
    seen: set[int] = set()
    with open(path, "rb") as fh:
        r = _BgzfRandomReader(fh)
        for c0, c1 in chunks:
            if not r.seek_voffset(c0):
                continue
            while r.voffset() < c1:
                v_rec = r.voffset()
                raw_size = r.read(4)
                if len(raw_size) < 4:
                    break
                block = r.read(struct.unpack("<i", raw_size)[0])
                if v_rec in seen:
                    continue
                seen.add(v_rec)
                rec = decode_bam_record(block)
                if rec.rname != "*":
                    idx = int(rec.rname)
                    rec.rname = refs[idx][0] if 0 <= idx < len(refs) else "*"
                if rec.rname != rname or rec.pos <= 0:
                    continue
                b = rec.pos - 1
                if b < end and b + cigar_ref_span(rec.cigar) > beg:
                    out.append(rec)
    return out
