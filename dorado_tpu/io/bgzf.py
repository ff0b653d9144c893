"""BGZF block-compressed writer (the container format of BAM).

Pure-python implementation over zlib raw-deflate: 64 KiB-max blocks, each a
complete gzip member carrying a BC extra field with the compressed block size,
terminated by the canonical 28-byte EOF block. Mirrors htslib bgzf semantics.
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO

# Canonical BGZF EOF marker block (htslib bgzf.c).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_MAX_BLOCK = 0xFF00  # 65280: htslib's max uncompressed payload per block


class BgzfWriter:
    def __init__(self, fileobj: BinaryIO, level: int = 6):
        self._fh = fileobj
        self._level = level
        self._buffer = bytearray()
        self._coffset = 0  # compressed bytes emitted so far

    def virtual_offset(self) -> int:
        """BGZF virtual offset (coffset << 16 | uoffset) of the next byte
        written — the coordinate BAI indexing addresses records by."""
        return (self._coffset << 16) | len(self._buffer)

    def write(self, data: bytes) -> None:
        self._buffer += data
        while len(self._buffer) >= _MAX_BLOCK:
            self._flush_block(bytes(self._buffer[:_MAX_BLOCK]))
            del self._buffer[:_MAX_BLOCK]

    def _flush_block(self, payload: bytes) -> None:
        compressor = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = compressor.compress(payload) + compressor.flush()
        bsize = len(cdata) + 26  # header(18) + footer(8)
        header = (
            b"\x1f\x8b\x08\x04"
            + struct.pack("<I", 0)
            + b"\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
        )
        footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
        self._fh.write(header + cdata + footer)
        self._coffset += bsize  # gzip member size on disk (header+cdata+footer)

    def flush(self) -> None:
        """Force the buffered payload out as a block, so the next write
        starts on a BGZF block boundary. Used after the BAM header so
        multi-host shard merging can raw-concatenate record blocks
        (samtools-cat style) without re-encoding."""
        if self._buffer:
            self._flush_block(bytes(self._buffer))
            self._buffer.clear()

    def close(self) -> None:
        self.flush()
        self._fh.write(BGZF_EOF)
        self._fh.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
