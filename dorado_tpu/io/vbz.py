"""VBZ signal codec (zstd + svb16 stream-variable-byte, zigzag delta).

POD5 stores raw int16 signal compressed with VBZ: values are delta-encoded,
zigzag-mapped to unsigned, packed svb16 (one control bit per value selecting a
1- or 2-byte encoding), and the result zstd-compressed. This is a clean-room
numpy implementation (vectorised gather on the control-bit prefix sums); a C
fast path lives in csrc/ when built.
"""

from __future__ import annotations

import numpy as np
import zstandard


def svb16_decode(raw: bytes, count: int, zigzag: bool = True, delta: bool = True) -> np.ndarray:
    """Decode an svb16 payload of ``count`` values to int16.

    Routes through the C fast path (native/vbz.cpp, ~40x per thread and
    GIL-free for the loader's worker threads); the vectorised numpy
    implementation below is the fallback and the parity reference."""
    if count == 0:
        return np.zeros(0, dtype=np.int16)
    try:
        from dorado_tpu.native import svb16_decode_native

        return svb16_decode_native(raw, count, zigzag=zigzag, delta=delta)
    except Exception:
        pass
    return _svb16_decode_numpy(raw, count, zigzag=zigzag, delta=delta)


def _svb16_decode_numpy(
    raw: bytes, count: int, zigzag: bool = True, delta: bool = True
) -> np.ndarray:
    key_len = (count + 7) // 8
    keys = np.frombuffer(raw, np.uint8, count=key_len)
    bits = np.unpackbits(keys, bitorder="little")[:count].astype(np.int64)
    data = np.frombuffer(raw, np.uint8, offset=key_len)

    lens = bits + 1
    offsets = np.empty(count, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens[:-1], out=offsets[1:])

    lo = data[offsets].astype(np.uint16)
    hi_idx = np.minimum(offsets + 1, len(data) - 1)
    hi = np.where(bits == 1, data[hi_idx], 0).astype(np.uint16)
    u = lo | (hi << np.uint16(8))

    if zigzag:
        vals = ((u >> np.uint16(1)) ^ (np.zeros_like(u) - (u & np.uint16(1)))).astype(
            np.int16
        )
    else:
        vals = u.view(np.int16) if u.dtype == np.uint16 else u.astype(np.int16)

    if delta:
        return np.cumsum(vals.astype(np.int64)).astype(np.int16)
    return vals


def svb16_encode(values: np.ndarray, zigzag: bool = True, delta: bool = True) -> bytes:
    """Encode int16 values as an svb16 payload (inverse of svb16_decode)."""
    values = np.asarray(values, dtype=np.int16)
    count = len(values)
    if count == 0:
        return b""
    if delta:
        work = np.diff(values.astype(np.int64), prepend=0)
        work = (work & 0xFFFF).astype(np.uint16)
    else:
        work = values.view(np.uint16)
    if zigzag:
        s = work.view(np.int16).astype(np.int32)
        work = ((s << 1) ^ (s >> 15)).astype(np.uint16)

    big = work > 0xFF
    key_len = (count + 7) // 8
    bits = np.zeros(key_len * 8, dtype=np.uint8)
    bits[:count] = big
    keys = np.packbits(bits, bitorder="little")

    lens = big.astype(np.int64) + 1
    offsets = np.concatenate([[0], np.cumsum(lens)])
    data = np.zeros(int(offsets[-1]), dtype=np.uint8)
    data[offsets[:-1]] = (work & 0xFF).astype(np.uint8)
    two = np.nonzero(big)[0]
    data[offsets[two] + 1] = (work[two] >> 8).astype(np.uint8)
    return keys.tobytes() + data.tobytes()


def decompress_signal(blob: bytes, sample_count: int) -> np.ndarray:
    """VBZ blob -> int16 signal of length sample_count."""
    if len(blob) == sample_count * 2:
        # uncompressed signal table
        return np.frombuffer(blob, dtype=np.int16, count=sample_count).copy()
    max_out = (sample_count + 7) // 8 + 2 * sample_count
    raw = zstandard.ZstdDecompressor().decompress(blob, max_output_size=max_out)
    # integrity: the svb16 payload must be EXACTLY key bytes + data bytes for
    # sample_count values — zstd frames without checksums can "successfully"
    # decode corrupted input into garbage of the wrong length
    key_len = (sample_count + 7) // 8
    if len(raw) < key_len:
        raise ValueError("corrupt VBZ: payload shorter than svb16 key stream")
    nbits = int(
        np.unpackbits(np.frombuffer(raw, np.uint8, count=key_len), bitorder="little")[
            :sample_count
        ].sum()
    )
    if len(raw) != key_len + sample_count + nbits:
        raise ValueError("corrupt VBZ: svb16 payload size mismatch")
    return svb16_decode(raw, sample_count)


def compress_signal(signal: np.ndarray) -> bytes:
    """int16 signal -> VBZ blob (svb16 + zstd level 1)."""
    payload = svb16_encode(np.asarray(signal, dtype=np.int16))
    return zstandard.ZstdCompressor(level=1).compress(payload)
