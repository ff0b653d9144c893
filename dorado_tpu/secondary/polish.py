"""Draft polishing pipeline (the role of `dorado polish`,
dorado/cli/cli_lib/polish.cpp + secondary/consensus/):

draft FASTA + aligned reads -> pileup count features over windows -> GRU
consensus model -> per-window consensus -> stitched polished sequence.

Reads may come pre-aligned (BAM/SAM) or be aligned internally with the
from-scratch mapper.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import numpy as np

from dorado_tpu.alignment.index import read_fasta
from dorado_tpu.secondary.model import decode_consensus, gru_forward
from dorado_tpu.secondary.pileup import AlignedRead, build_pileup


@dataclass
class PolishStats:
    windows: int = 0
    contigs: int = 0


class PolishPipeline:
    def __init__(
        self,
        params,
        window_len: int = 10000,
        batch_size: int = 8,
        forward=None,
        feature_kind: str = "counts",
    ):
        """feature_kind "counts" feeds the medaka counts pileup (GRUModel);
        "read_level" feeds the [P, D, 4] read matrix (LatentSpaceLSTM /
        SlotAttentionConsensus / VariantPerceiver, encoder_read_alignment)."""
        self.params = params
        self.window_len = window_len
        self.batch_size = batch_size
        self.feature_kind = feature_kind
        # provided forwards may include host-side steps (adjacency phasing),
        # so only the default counts GRU is jitted here
        self._fn = forward if forward is not None else jax.jit(gru_forward)
        self.stats = PolishStats()

    def polish_contig(self, draft: str, reads: list[AlignedRead]) -> str:
        """Polish one contig; windows are non-overlapping (window stitching
        simply concatenates — windows cut at major-position boundaries)."""
        n = len(draft)
        pieces = []
        for start in range(0, n, self.window_len):
            end = min(n, start + self.window_len)
            window_reads = [
                r for r in reads if r.ref_start < end and self._read_end(r) > start
            ]
            pile = build_pileup(window_reads, start, end)
            if pile.depth.max(initial=0.0) == 0:
                pieces.append(draft[start:end])  # no coverage: keep draft
                self.stats.windows += 1
                continue
            if self.feature_kind == "read_level":
                from dorado_tpu.secondary.read_matrix import build_read_matrix

                rm = build_read_matrix(window_reads, start, end)
                feats = rm.matrix[None, ...]  # [1, P, D, 4]
            else:
                feats = pile.counts[None, ...]  # [1, P, 10]
            logits = np.asarray(self._fn(self.params, feats))[0]
            if logits.ndim == 3:
                # multi-slot/ploidy outputs: haplotype 0 carries the
                # consensus for haploid polishing
                logits = logits[:, 0]
            # positions with zero depth keep the draft base
            classes = logits.argmax(axis=-1)
            out = []
            for i in range(len(classes)):
                if pile.depth[i] == 0:
                    if pile.positions_minor[i] == 0:
                        out.append(draft[pile.positions_major[i]])
                    continue
                c = int(classes[i])
                if c != 0:
                    out.append("*ACGT"[c])
            pieces.append("".join(out))
            self.stats.windows += 1
        return "".join(pieces)

    @staticmethod
    def _read_end(read: AlignedRead) -> int:
        import re

        length = 0
        for num, op in re.findall(r"(\d+)([MIDNSHP=X])", read.cigar):
            if op in "M=XDN":
                length += int(num)
        return read.ref_start + length

    def run(self, draft_fasta: Path | str, alignments_by_contig: dict[str, list[AlignedRead]]):
        """[(name, polished_seq)] for every draft contig."""
        out = []
        for name, seq in read_fasta(draft_fasta):
            reads = alignments_by_contig.get(name, [])
            out.append((name, self.polish_contig(seq, reads)))
            self.stats.contigs += 1
        return out
