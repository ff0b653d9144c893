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


def merge_host_bams(output: str | Path, process_count: int) -> int:
    """Concatenate per-host BAM shards into the primary output (host 0).

    Streams records (BGZF member at a time) from each ``.hostN.bam`` shard
    into the shard-0 file — the per-host analogue of the reference's common
    processed-read queue feeding one HtsWriter (BasecallerNode.cpp:488).
    Returns the number of records appended; shard files are removed.
    """
    import os
    import struct

    from dorado_tpu.io.bam_reader import stream_bam
    from dorado_tpu.io.bgzf import BgzfWriter
    from dorado_tpu.io.sam import encode_bam_record

    output = Path(output)
    shards = [
        host_output_path(output, pi)
        for pi in range(1, process_count)
    ]
    shards = [s for s in shards if s.exists()]
    if not shards:
        return 0

    # stream host 0's records plus every shard's into a fresh combined file,
    # keeping shard 0's header verbatim
    tmp = output.with_suffix(output.suffix + ".merge")
    appended = 0
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
