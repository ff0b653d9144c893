"""Read-level feature matrix for the secondary model zoo.

Parity with the medaka-style read-alignment encoder
(dorado/secondary/features/medaka_read_matrix.cpp:257-680 +
encoder_read_alignment.cpp:449-475): per (position, read) rows carry
[BASE, QUAL, STRAND, MAPQ] where base ∈ {0: padding, 1..4: ACGT,
5: deletion}, qual is raw phred (-1 at deletions), strand ∈ {-1, +1}
(0 padding), over the same expanded (major, minor) position axis as the
counts pileup.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dorado_tpu.secondary.pileup import _CIGAR_RE, AlignedRead

BASE_TO_NUM = {"A": 1, "C": 2, "G": 3, "T": 4}
DEL_VAL = 5
NUM_FEATURES = 4  # base, qual, strand, mapq


@dataclass
class ReadMatrixResult:
    matrix: np.ndarray  # [P, D, 4] float32
    positions_major: np.ndarray
    positions_minor: np.ndarray


def build_read_matrix(
    reads: list[AlignedRead],
    region_start: int,
    region_end: int,
    quals: list[np.ndarray] | None = None,
    mapqs: list[int] | None = None,
    max_reads: int = 100,
) -> ReadMatrixResult:
    """Returns the [positions, reads, features] tensor consumed by
    LatentSpaceLSTM / SlotAttentionConsensus / VariantPerceiver."""
    n_major = region_end - region_start
    max_ins = np.zeros(n_major, dtype=np.int64)
    parsed = []
    for read in reads:
        ops = [(int(n), op) for n, op in _CIGAR_RE.findall(read.cigar)]
        parsed.append(ops)
        rpos = read.ref_start
        for n, op in ops:
            if op in "M=XDN":
                rpos += n
            elif op == "I":
                idx = rpos - 1 - region_start
                if 0 <= idx < n_major:
                    max_ins[idx] = max(max_ins[idx], n)

    offsets = np.zeros(n_major + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(1 + max_ins)
    total = int(offsets[-1])
    positions_major = np.zeros(total, dtype=np.int64)
    positions_minor = np.zeros(total, dtype=np.int64)
    for i in range(n_major):
        lo, hi = offsets[i], offsets[i + 1]
        positions_major[lo:hi] = region_start + i
        positions_minor[lo:hi] = np.arange(hi - lo)

    depth = min(len(reads), max_reads)
    matrix = np.zeros((total, max(depth, 1), NUM_FEATURES), dtype=np.float32)

    for read_i, (read, ops) in enumerate(zip(reads, parsed)):
        if read_i >= max_reads:
            break
        strand = -1.0 if read.is_reverse else 1.0
        mapq = float(mapqs[read_i]) if mapqs is not None else 60.0
        qual = quals[read_i] if quals is not None else None

        def put_base(p, q_idx):
            base = BASE_TO_NUM.get(read.seq[q_idx], 0)
            q = float(qual[q_idx]) if qual is not None and len(qual) else 40.0
            matrix[p, read_i] = (base, q, strand, mapq)

        def put_del(p):
            matrix[p, read_i] = (DEL_VAL, -1.0, strand, mapq)

        rpos = read.ref_start
        qpos = 0
        for n, op in ops:
            if op in "M=X":
                for j in range(n):
                    idx = rpos + j - region_start
                    if 0 <= idx < n_major:
                        put_base(offsets[idx], qpos + j)
                rpos += n
                qpos += n
            elif op == "I":
                anchor = rpos - 1 - region_start
                if 0 <= anchor < n_major:
                    for j in range(n):
                        p = offsets[anchor] + 1 + j
                        if p < offsets[anchor + 1]:
                            put_base(p, qpos + j)
                qpos += n
            elif op in "DN":
                for j in range(n):
                    idx = rpos + j - region_start
                    if 0 <= idx < n_major:
                        put_del(offsets[idx])
                rpos += n
            elif op == "S":
                qpos += n

        # spanning reads record deletions at minor columns they skip
        # (medaka_read_matrix.cpp:621-650)
        read_end = rpos
        for i in range(n_major):
            lo, hi = offsets[i], offsets[i + 1]
            if hi - lo > 1 and read.ref_start <= region_start + i < read_end:
                for p in range(lo + 1, hi):
                    if matrix[p, read_i, 0] == 0:
                        put_del(p)

    return ReadMatrixResult(
        matrix=matrix,
        positions_major=positions_major,
        positions_minor=positions_minor,
    )
