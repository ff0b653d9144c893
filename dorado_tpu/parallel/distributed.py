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
