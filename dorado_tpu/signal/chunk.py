"""Chunk-offset generation for overlapping signal windows.

Long reads (up to millions of samples) are sliced into fixed-size overlapping
chunks before batched inference; stitching (see ``stitch.py``) reassembles the
per-chunk calls. Offset arithmetic matches the reference behaviour
(dorado/read_pipeline/base/chunk.cpp:11-107) so that stitch trim points agree.
"""

from __future__ import annotations

import math


def generate_chunks(
    num_samples: int, chunk_size: int, stride: int, overlap: int
) -> list[int]:
    """Fixed-size chunk offsets covering ``num_samples``.

    Every chunk is ``chunk_size`` long except that the final chunk is pulled
    back so it ends at (or stride-aligned just past) the end of the read.
    """
    if num_samples == 0:
        raise ValueError("generate_chunks: empty read")
    if stride <= 0:
        raise ValueError(f"generate_chunks: invalid stride {stride}")
    if chunk_size <= 0 or chunk_size % stride != 0 or chunk_size <= overlap:
        raise ValueError(
            f"generate_chunks: invalid chunk size {chunk_size} "
            f"with overlap {overlap} and stride {stride}"
        )
    if overlap % stride != 0:
        raise ValueError(
            f"generate_chunks: invalid overlap {overlap} with stride {stride}"
        )

    offsets = [0]
    offset = 0
    last_offset = num_samples - chunk_size if num_samples > chunk_size else 0
    misalignment = last_offset % stride
    if misalignment:
        # Align the final chunk start up to a stride boundary; the excess
        # samples past the read end are zero-padded by the caller.
        last_offset += stride - misalignment
    chunk_step = chunk_size - overlap
    while offset + chunk_size < num_samples:
        offset = min(offset + chunk_step, last_offset)
        offsets.append(offset)
    return offsets


def generate_variable_chunks(
    num_samples: int, chunk_size: int, stride: int, overlap: int
) -> list[tuple[int, int]]:
    """Balanced (start, end) intervals: same chunk count as the fixed scheme
    but with the load spread evenly so every chunk is nearly the same size."""
    if num_samples == 0:
        raise ValueError("generate_variable_chunks: empty read")
    if stride <= 0:
        raise ValueError(f"generate_variable_chunks: invalid stride {stride}")
    if (
        chunk_size <= 0
        or chunk_size % stride != 0
        or chunk_size == stride
        or chunk_size <= overlap
    ):
        raise ValueError(
            f"generate_variable_chunks: invalid chunk size {chunk_size} "
            f"with overlap {overlap} and stride {stride}"
        )
    if overlap % stride != 0 or (stride != 1 and overlap == 0):
        raise ValueError(
            f"generate_variable_chunks: invalid overlap {overlap} with stride {stride}"
        )

    num_chunks = 1
    if num_samples > chunk_size:
        num_chunks += math.ceil((num_samples - chunk_size) / (chunk_size - overlap))

    total_with_overlaps = num_samples + (num_chunks - 1) * overlap
    num_longer = total_with_overlaps % num_chunks
    adjusted = total_with_overlaps // num_chunks

    intervals: list[list[int]] = []
    chunk_start = 0
    for i in range(num_chunks):
        end = chunk_start + adjusted + (1 if i < num_longer else 0)
        intervals.append([chunk_start, end])
        chunk_start = end - overlap

    # Stride-align interior boundaries: starts round up, ends round down.
    for i in range(1, num_chunks):
        misalignment = intervals[i][0] % stride
        if misalignment:
            intervals[i][0] += stride - misalignment
    for i in range(num_chunks - 1):
        misalignment = intervals[i][1] % stride
        if misalignment:
            intervals[i][1] -= misalignment

    return [(s, e) for s, e in intervals]
