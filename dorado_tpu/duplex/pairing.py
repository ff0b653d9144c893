"""Duplex pair detection over channel-ordered simplex calls.

Heuristics follow the reference PairingNode
(dorado/read_pipeline/nodes/PairingNode.cpp:17-116): candidate reads must be
pore-adjacent in time on the same channel/mux, pass time-delta / length /
qscore gates, and either early-accept (near-identical lengths, <100 ms gap)
or pass an overlap check. The reference's overlap check uses minimap2; here
it is an alignment-based check with the native banded aligner: the
RC(complement) must align to the template suffix with low error.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dorado_tpu.utils import mean_qscore_from_qstring, reverse_complement

MAX_TIME_DELTA_MS = 10000
MIN_SEQ_LENGTH = 500
MIN_QSCORE = 8.0
EARLY_ACCEPT_LEN_RATIO = 0.98
EARLY_ACCEPT_TIME_DELTA_MS = 100
MIN_OVERLAP_LENGTH = 50
MAX_OVERLAP_ERROR_RATE = 0.30


@dataclass
class CandidateRead:
    read_id: str
    channel: int
    mux: int
    start_time_ms: int
    duration_ms: int
    seq: str
    qstring: str
    moves: np.ndarray
    signal: np.ndarray  # scaled model-input signal
    payload: object = None  # caller-side record handle

    @property
    def end_time_ms(self) -> int:
        return self.start_time_ms + self.duration_ms


@dataclass
class PairingResult:
    template: CandidateRead
    complement: CandidateRead
    template_seq_start: int
    template_seq_end: int
    complement_seq_start: int
    complement_seq_end: int


def check_pair(
    temp: CandidateRead, comp: CandidateRead, use_alignment: bool = True
) -> PairingResult | None:
    delta = comp.start_time_ms - temp.end_time_ms
    len1, len2 = len(temp.seq), len(comp.seq)
    min_len, max_len = min(len1, len2), max(len1, len2)
    if min_len == 0:
        return None
    min_q = min(
        mean_qscore_from_qstring(temp.qstring), mean_qscore_from_qstring(comp.qstring)
    )
    if delta < 0 or delta >= MAX_TIME_DELTA_MS or min_len < MIN_SEQ_LENGTH or min_q < MIN_QSCORE:
        return None

    len_ratio = min_len / max_len
    if (
        delta <= EARLY_ACCEPT_TIME_DELTA_MS
        and len_ratio >= EARLY_ACCEPT_LEN_RATIO
        and min_len >= 5000
    ):
        return PairingResult(temp, comp, 0, len1 - 1, 0, len2 - 1)

    if len_ratio < 0.2:
        return None
    if not use_alignment:
        return None

    # Overlap check: align RC(complement) globally against the template.
    # Accept when the alignment error rate over the overlap is low.
    from dorado_tpu.native import align

    rc = reverse_complement(comp.seq)
    res = align(rc, temp.seq)
    if len(res.ops) < MIN_OVERLAP_LENGTH:
        return None
    err = res.distance / max(1, len(res.ops))
    if err > MAX_OVERLAP_ERROR_RATE:
        return None
    return PairingResult(temp, comp, 0, len1 - 1, 0, len2 - 1)


class DuplexPairer:
    """Streaming pairer: feed channel-ordered reads, emits pairs.

    Mirrors the channel/mux cache of PairingNode::pair_generating_worker_thread
    but simplified to sequential per-channel scan (the input loader already
    orders by channel)."""

    def __init__(self, use_alignment: bool = True):
        self._last: dict[tuple[int, int], CandidateRead] = {}
        self.use_alignment = use_alignment
        self.pairs_found = 0

    def push(self, read: CandidateRead) -> PairingResult | None:
        key = (read.channel, read.mux)
        prev = self._last.get(key)
        self._last[key] = read
        if prev is None:
            return None
        result = check_pair(prev, read, self.use_alignment)
        if result is not None:
            self.pairs_found += 1
            # a read can only belong to one pair: drop it from the cache
            del self._last[key]
        return result
