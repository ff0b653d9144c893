"""Multi-host orchestration helpers.

The reference has no distributed backend (SURVEY §2.4/§5.8: single process,
shared-memory queues). The TPU-native equivalent for pod slices follows the
"aggregate-only-at-the-end" structure: `jax.distributed` process groups,
weights replicated by NamedSharding, the chunk batch sharded over local
chips (ICI), and the POD5 *file list* sharded across hosts (DCN never sees
activations). Per-host output BAMs are concatenated at the end, mirroring
the reference's common processed-chunks queue (BasecallerNode.cpp:488).
"""

from __future__ import annotations

from pathlib import Path

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialise jax.distributed when running multi-host; a no-op for the
    single-process case. Returns (process_index, process_count)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shard_files_for_host(
    files: list[Path], process_index: int | None = None, process_count: int | None = None
) -> list[Path]:
    """Static round-robin POD5 file sharding across hosts — input parallelism
    over DCN while chunks stay host-local (the DataLoader-per-host design)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(sorted(files)) if i % pc == pi]


def host_output_path(output: str | Path, process_index: int | None = None) -> Path:
    """Per-host output shard name; shard 0 keeps the user-visible name so the
    single-host case is unchanged."""
    pi = jax.process_index() if process_index is None else process_index
    output = Path(output)
    if pi == 0:
        return output
    return output.with_suffix(f".host{pi}{output.suffix}")


def all_reduce_stats(values: dict[str, float]) -> dict[str, float]:
    """Global sum of per-host pipeline counters (reads/bases/samples).

    The reference aggregates stats in one process (StatsCounter over shared
    queues); across hosts the TPU-native equivalent is one tiny all-reduce at
    the end of the run. Uses a psum over a mesh spanning every global device,
    with each host contributing its local value on its own devices — a no-op
    in the single-process case.
    """
    import numpy as np

    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    local = np.asarray([float(values[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)  # [P, K]
    summed = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def barrier(name: str = "sync") -> None:
    """Block until every process reaches this point (end-of-run fence before
    the host-0 output merge)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def _bam_header_block_span(path: Path) -> int | None:
    info = _bam_header_info(path)
    return info[0] if info is not None else None


def _bam_header_info(path: Path) -> tuple[int, bytes] | None:
    """(byte offset where record BGZF blocks start, decompressed header
    payload) for ``path``, if the BAM header ends exactly on a block
    boundary (guaranteed for files written by io/sam.py BamWriter, which
    flushes after the header); None if the header shares a block with
    records (foreign writer) — callers must fall back to record
    re-encoding. The header payload lets the raw-splice merge verify the
    shards' reference/read-group tables (positional in BAM records) match
    host 0's before splicing."""
    import struct
    import zlib

    with open(path, "rb") as fh:
        payload = b""
        header_ulen = None
        coffset = 0
        while True:
            head = fh.read(18)
            if len(head) < 18:
                return None
            if head[:4] != b"\x1f\x8b\x08\x04":
                return None
            xlen = struct.unpack("<H", head[10:12])[0]
            extra = head[12:18] + fh.read(xlen - 6)
            bsize = None
            i = 0
            while i + 4 <= len(extra):
                si1, si2, slen = extra[i], extra[i + 1], struct.unpack(
                    "<H", extra[i + 2 : i + 4]
                )[0]
                if si1 == 0x42 and si2 == 0x43 and slen == 2:
                    bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
                i += 4 + slen
            if bsize is None:
                return None
            cdata = fh.read(bsize - 18 - xlen + 6 - 8)
            fh.read(8)  # crc + isize
            payload += zlib.decompress(cdata, -15)
            coffset += bsize
            if header_ulen is None and len(payload) >= 12:
                if payload[:4] != b"BAM\x01":
                    return None
                l_text = struct.unpack("<i", payload[4:8])[0]
                if len(payload) >= 12 + l_text:
                    n_ref = struct.unpack(
                        "<i", payload[8 + l_text : 12 + l_text]
                    )[0]
                    pos = 12 + l_text
                    ok = True
                    for _ in range(n_ref):
                        if len(payload) < pos + 4:
                            ok = False
                            break
                        l_name = struct.unpack(
                            "<i", payload[pos : pos + 4]
                        )[0]
                        pos += 8 + l_name
                    if ok and pos <= len(payload):
                        header_ulen = pos
            if header_ulen is not None:
                if len(payload) == header_ulen:
                    return coffset, payload
                if len(payload) > header_ulen:
                    return None  # records share the header's last block
            if len(payload) > (1 << 24):  # runaway header: bail to slow path
                return None


def merge_host_bams(output: str | Path, process_count: int) -> int:
    """Concatenate per-host BAM shards into the primary output (host 0).

    Fast path (files written by this package): the header ends on a BGZF
    block boundary, so each shard's record blocks are spliced into host 0's
    file as raw compressed bytes — host 0's trailing EOF marker is cut, the
    shards' header blocks and EOF markers are skipped, and one EOF is
    appended. No record is decompressed or re-encoded, so the merge runs at
    IO speed regardless of output size — the BGZF-native equivalent of the
    reference appending every host's reads to one writer
    (BasecallerNode.cpp:488), samtools-cat style. Foreign shards whose
    header shares a block with records fall back to streaming re-encode.
    Returns the number of records appended; shard files are removed.
    """
    import os
    import struct

    from dorado_tpu.io.bam_reader import stream_bam
    from dorado_tpu.io.bgzf import BGZF_EOF, BgzfWriter
    from dorado_tpu.io.sam import encode_bam_record

    output = Path(output)
    shards = [
        host_output_path(output, pi)
        for pi in range(1, process_count)
    ]
    shards = [s for s in shards if s.exists()]
    if not shards:
        return 0

    infos = {s: _bam_header_info(s) for s in shards}
    spans = {s: (i[0] if i else None) for s, i in infos.items()}
    own_info = _bam_header_info(output)

    def shard_spliceable(s: Path) -> bool:
        # raw splice is only sound when (a) the shard's decompressed
        # header matches host 0's byte-for-byte (reference ids and read
        # groups are positional in BAM records — a silent mismatch would
        # mis-attribute records), and (b) the shard ends with the BGZF EOF
        # marker (a shard from a crashed writer would otherwise lose its
        # last 28 bytes of record data to the EOF-trim below)
        info = infos[s]
        if info is None or own_info is None or info[1] != own_info[1]:
            return False
        with open(s, "rb") as fh:
            fh.seek(max(0, s.stat().st_size - len(BGZF_EOF)))
            return fh.read() == BGZF_EOF

    def count_records(path: Path) -> int:
        # record count via the 4-byte block_size length walk over inflated
        # BGZF payloads — no SamRecord decode, ~10x cheaper than stream_bam
        import zlib

        n = 0
        pending = b""
        need = 0  # bytes of the current record still to skip
        with open(path, "rb") as fh:
            fh.seek(spans[path])
            while True:
                head = fh.read(18)
                if len(head) < 18:
                    break
                xlen = struct.unpack("<H", head[10:12])[0]
                extra = head[12:18] + fh.read(xlen - 6)
                bsize = None
                i = 0
                while i + 4 <= len(extra):
                    if extra[i] == 0x42 and extra[i + 1] == 0x43:
                        bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
                    i += 4 + struct.unpack("<H", extra[i + 2 : i + 4])[0]
                cdata = fh.read(bsize - 12 - xlen - 8)
                fh.read(8)
                buf = pending + zlib.decompress(cdata, -15)
                pos = 0
                while True:
                    if need:
                        take = min(need, len(buf) - pos)
                        pos += take
                        need -= take
                        if need:
                            break
                    if pos + 4 > len(buf):
                        break
                    need = struct.unpack("<i", buf[pos : pos + 4])[0]
                    pos += 4
                    n += 1
                pending = buf[pos:]
        return n

    appended = 0
    try:
        fast_ok = own_info is not None and all(shard_spliceable(s) for s in shards)
        if fast_ok:
            # zlib releases the GIL, so the per-shard count walks run
            # concurrently (the count is the only part of the fast path
            # that inflates payloads; unparallelised it throttled the
            # merge below filesystem copy speed)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(shards))) as pool:
                counts = dict(zip(shards, pool.map(count_records, shards)))
        else:
            counts = {}
    except Exception:
        # truncated shard / parse error: the streaming re-encode below
        # copes record-by-record
        fast_ok = False
    if fast_ok:
        # raw splice: append each shard's record bytes to host 0's file
        with open(output, "r+b") as out_f:
            out_f.seek(0, os.SEEK_END)
            size = out_f.tell()
            out_f.seek(max(0, size - len(BGZF_EOF)))
            if out_f.read(len(BGZF_EOF)) == BGZF_EOF:
                out_f.seek(size - len(BGZF_EOF))
                out_f.truncate()
            else:
                out_f.seek(0, os.SEEK_END)
            for s in shards:
                appended += counts[s]
                with open(s, "rb") as in_f:
                    in_f.seek(spans[s])
                    # copy everything except the trailing EOF marker
                    remaining = s.stat().st_size - spans[s] - len(BGZF_EOF)
                    while remaining > 0:
                        chunk = in_f.read(min(1 << 20, remaining))
                        if not chunk:
                            break
                        out_f.write(chunk)
                        remaining -= len(chunk)
            out_f.write(BGZF_EOF)
        for s in shards:
            s.unlink()
        return appended

    # slow path: stream host 0's records plus every shard's into a fresh
    # combined file, keeping shard 0's header verbatim
    tmp = output.with_suffix(output.suffix + ".merge")
    with open(tmp, "wb") as out_f:
        bgzf = None
        ref_ids: dict[str, int] = {}
        for src in [output, *shards]:
            with open(src, "rb") as in_f:
                header_text, refs, records = stream_bam(in_f)
                if bgzf is None:
                    bgzf = BgzfWriter(out_f)
                    text = header_text.encode()
                    blob = b"BAM\x01" + struct.pack("<i", len(text)) + text
                    blob += struct.pack("<i", len(refs))
                    for name, length in refs:
                        nb = name.encode() + b"\x00"
                        blob += struct.pack("<i", len(nb)) + nb
                        blob += struct.pack("<i", length)
                    bgzf.write(blob)
                    ref_ids = {name: i for i, (name, _) in enumerate(refs)}
                for rec in records:
                    bgzf.write(encode_bam_record(rec, ref_ids))
                    if src != output:
                        appended += 1
        if bgzf is not None:
            bgzf.close()
    os.replace(tmp, output)
    for s in shards:
        s.unlink()
    return appended
