"""Seed-chain-extend read mapper (the role of dorado's AlignerNode +
ont-minimap2, built from scratch).

Per query: minimizer anchors against the reference index -> colinear
chaining (gap-penalised DP with bounded lookback, minimap2-style scoring) ->
banded global extension of the chained span with the native aligner ->
CIGAR/NM/AS and a chain-score-based MAPQ. Primary/secondary selection keeps
the best chain per query with mapq downweighted when the runner-up is close.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dorado_tpu.alignment.index import ReferenceIndex
from dorado_tpu.alignment.minimizer import minimizers
from dorado_tpu.native import align as nat_align
from dorado_tpu.utils import reverse_complement


@dataclass
class Alignment:
    ref_name: str
    ref_start: int  # 0-based
    ref_end: int
    q_start: int
    q_end: int
    is_reverse: bool
    mapq: int
    cigar: str
    nm: int
    score: int
    is_secondary: bool = False


_OPS = {0: "M", 3: "M", 1: "I", 2: "D"}  # edlib-style op -> CIGAR (M for =/X)


def _ops_to_cigar(ops: np.ndarray) -> str:
    if len(ops) == 0:
        return "*"
    syms = np.array([_OPS[o] for o in ops])
    out = []
    run_start = 0
    for i in range(1, len(syms) + 1):
        if i == len(syms) or syms[i] != syms[run_start]:
            out.append(f"{i - run_start}{syms[run_start]}")
            run_start = i
    return "".join(out)


def _chain(q_pos: np.ndarray, r_pos: np.ndarray, k: int, max_gap: int = 5000,
           lookback: int = 50) -> tuple[np.ndarray, int]:
    """Colinear chaining over anchors sorted by (r_pos, q_pos); returns the
    indices of the best chain and its score (minimap2 chaining recurrence
    with a simplified gap cost)."""
    n = len(q_pos)
    order = np.lexsort((q_pos, r_pos))
    q = q_pos[order]
    r = r_pos[order]
    score = np.full(n, k, dtype=np.float64)
    parent = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        lo = max(0, i - lookback)
        for j in range(i - 1, lo - 1, -1):
            dq = q[i] - q[j]
            dr = r[i] - r[j]
            if dq <= 0 or dr <= 0 or dq > max_gap or dr > max_gap:
                continue
            gap = abs(dr - dq)
            match = min(min(dq, dr), k)
            gap_cost = 0.01 * k * gap + 0.5 * np.log2(gap + 1) if gap else 0.0
            s = score[j] + match - gap_cost
            if s > score[i]:
                score[i] = s
                parent[i] = j
    best = int(np.argmax(score))
    chain = []
    i = best
    while i != -1:
        chain.append(i)
        i = int(parent[i])
    chain.reverse()
    return order[np.asarray(chain, dtype=np.int64)], int(score[best])


class Mapper:
    def __init__(self, index: ReferenceIndex, min_chain_anchors: int = 3,
                 min_chain_score: int = 40, max_alignments: int = 1):
        self.index = index
        self.min_chain_anchors = min_chain_anchors
        self.min_chain_score = min_chain_score
        self.max_alignments = max_alignments

    def map(self, query: str) -> list[Alignment]:
        idx = self.index
        qh, qp, qs = minimizers(query, idx.k, idx.w)
        if len(qh) == 0:
            return []
        lo, hi = idx.lookup(qh)
        counts = hi - lo
        keep = (counts > 0) & (counts <= idx.max_occ)
        if not keep.any():
            return []

        # collect anchors per (seq_id, strand)
        anchors: dict[tuple[int, int], list[tuple[int, int]]] = {}
        qlen = len(query)
        for qi in np.flatnonzero(keep):
            for t in range(int(lo[qi]), int(hi[qi])):
                sid = int(idx.seq_ids[t])
                rpos = int(idx.positions[t])
                strand = int(qs[qi]) ^ int(idx.strands[t])
                if strand == 0:
                    qpos = int(qp[qi])
                else:
                    qpos = qlen - int(qp[qi]) - idx.k
                anchors.setdefault((sid, strand), []).append((qpos, rpos))

        candidates = []
        for (sid, strand), pairs in anchors.items():
            if len(pairs) < self.min_chain_anchors:
                continue
            arr = np.asarray(pairs, dtype=np.int64)
            chain_idx, score = _chain(arr[:, 0], arr[:, 1], idx.k)
            if len(chain_idx) < self.min_chain_anchors or score < self.min_chain_score:
                continue
            chain = arr[chain_idx]
            candidates.append((score, sid, strand, chain))

        if not candidates:
            return []
        candidates.sort(key=lambda c: -c[0])

        results = []
        best_score = candidates[0][0]
        second_score = candidates[1][0] if len(candidates) > 1 else 0
        for rank, (score, sid, strand, chain) in enumerate(
            candidates[: self.max_alignments]
        ):
            q_lo = int(chain[0, 0])
            q_hi = int(chain[-1, 0]) + idx.k
            r_lo = int(chain[0, 1])
            r_hi = int(chain[-1, 1]) + idx.k

            qseq = query if strand == 0 else reverse_complement(query)
            # extend chain span to query ends, clamped to the reference
            ext_left = q_lo
            ext_right = len(qseq) - q_hi
            r_start = max(0, r_lo - int(ext_left * 1.2) - 32)
            r_end = min(idx.lengths[sid], r_hi + int(ext_right * 1.2) + 32)
            ref_seq = idx.seqs[sid][r_start:r_end]

            res = nat_align(qseq, ref_seq, mode=1)  # HW: free ref end gaps
            if res.distance < 0:
                continue
            cigar = _ops_to_cigar(res.ops)
            n_match = int((res.ops == 0).sum())
            results.append(
                Alignment(
                    ref_name=idx.names[sid],
                    ref_start=r_start + res.t_start,
                    ref_end=r_start + res.t_end,
                    q_start=0,
                    q_end=len(qseq),
                    is_reverse=bool(strand),
                    mapq=self._mapq(best_score, second_score),
                    cigar=cigar,
                    nm=int(res.distance),
                    score=score,
                    is_secondary=rank > 0,
                )
            )
        return results

    @staticmethod
    def _mapq(best: float, second: float) -> int:
        if best <= 0:
            return 0
        frac = 1.0 - (second / best)
        return int(min(60, max(0, 40 * frac * min(1.0, best / 100.0) + 20 * frac)))
