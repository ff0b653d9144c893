"""BGZF block-compressed writer (the container format of BAM).

Pure-python implementation over zlib raw-deflate: 64 KiB-max blocks, each a
complete gzip member carrying a BC extra field with the compressed block size,
terminated by the canonical 28-byte EOF block. Mirrors htslib bgzf semantics.
"""

from __future__ import annotations

import struct
import zlib
from collections import deque
from typing import BinaryIO

# Canonical BGZF EOF marker block (htslib bgzf.c).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_MAX_BLOCK = 0xFF00  # 65280: htslib's max uncompressed payload per block


def _compress_member(payload: bytes, level: int) -> bytes:
    """One complete BGZF gzip member for ``payload``. Pure function so it
    can run on a worker thread (zlib releases the GIL)."""
    compressor = zlib.compressobj(level, zlib.DEFLATED, -15)
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
    return header + cdata + footer


class BgzfWriter:
    """``threads > 1`` compresses full blocks on a thread pool and writes
    the members in submission order — htslib's ``bgzf_mt`` analogue, with
    byte-identical output (each 64 KiB block is an independent gzip member,
    and zlib output is deterministic for a given level). Parallel mode is
    incompatible with per-record ``virtual_offset`` queries (BAI building):
    the compressed size of in-flight blocks is unknown until they finish."""

    def __init__(self, fileobj: BinaryIO, level: int = 6, threads: int = 0):
        self._fh = fileobj
        self._level = level
        self._buffer = bytearray()
        self._coffset = 0  # compressed bytes emitted so far
        self._pool = None
        self._pending: deque = deque()
        if threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=threads)
            self._high_water = threads * 4

    def virtual_offset(self) -> int:
        """BGZF virtual offset (coffset << 16 | uoffset) of the next byte
        written — the coordinate BAI indexing addresses records by."""
        if self._pool is not None and self._pending:
            self._drain(wait_all=True)
        return (self._coffset << 16) | len(self._buffer)

    def write(self, data: bytes) -> None:
        self._buffer += data
        while len(self._buffer) >= _MAX_BLOCK:
            payload = bytes(self._buffer[:_MAX_BLOCK])
            del self._buffer[:_MAX_BLOCK]
            if self._pool is not None:
                self._pending.append(
                    self._pool.submit(_compress_member, payload, self._level)
                )
                self._drain()
            else:
                self._write_member(_compress_member(payload, self._level))

    def _write_member(self, member: bytes) -> None:
        self._fh.write(member)
        self._coffset += len(member)

    def _drain(self, wait_all: bool = False) -> None:
        # emit completed members in order; block only above the high-water
        # mark (bounds memory at ~high_water * 64 KiB)
        while self._pending:
            head = self._pending[0]
            if wait_all or len(self._pending) > self._high_water or head.done():
                self._write_member(self._pending.popleft().result())
            else:
                break

    def flush(self) -> None:
        """Force the buffered payload out as a block, so the next write
        starts on a BGZF block boundary. Used after the BAM header so
        multi-host shard merging can raw-concatenate record blocks
        (samtools-cat style) without re-encoding."""
        if self._pending:
            self._drain(wait_all=True)
        if self._buffer:
            self._write_member(_compress_member(bytes(self._buffer), self._level))
            self._buffer.clear()

    def close(self) -> None:
        self.flush()
        self._fh.write(BGZF_EOF)
        self._fh.flush()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
