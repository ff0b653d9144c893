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
from dorado_tpu.secondary.model import gru_forward
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
        min_depth: int = 0,
    ):
        """feature_kind "counts" feeds the medaka counts pileup (GRUModel);
        "read_level" feeds the [P, D, 4] read matrix (LatentSpaceLSTM /
        SlotAttentionConsensus / VariantPerceiver, encoder_read_alignment)."""
        self.params = params
        self.window_len = window_len
        self.batch_size = batch_size
        self.feature_kind = feature_kind
        self.min_depth = min_depth
        # provided forwards may include host-side steps (adjacency phasing),
        # so only the default counts GRU is jitted here
        self._fn = forward if forward is not None else jax.jit(gru_forward)
        self.stats = PolishStats()

    def polish_contig(
        self,
        draft: str,
        reads: list[AlignedRead],
        region_start: int = 0,
        region_end: int | None = None,
        with_quals: bool = False,
    ):
        """Polish one contig; windows are non-overlapping (window stitching
        simply concatenates — windows cut at major-position boundaries).
        ``region_start/region_end`` restrict polishing to a sub-span (the
        --regions option); flanks outside the span keep the draft.
        With ``with_quals`` returns (seq, qual_phred_string)."""
        n = len(draft)
        region_end = n if region_end is None else min(region_end, n)
        pieces = []
        quals = []
        if region_start > 0:
            pieces.append(draft[:region_start])
            quals.append("!" * region_start)
        for start in range(region_start, region_end, self.window_len):
            end = min(region_end, start + self.window_len)
            window_reads = [
                r for r in reads if r.ref_start < end and self._read_end(r) > start
            ]
            pile = build_pileup(window_reads, start, end)
            if pile.depth.max(initial=0.0) == 0:
                pieces.append(draft[start:end])  # no coverage: keep draft
                quals.append("!" * (end - start))
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
            # positions below min coverage keep the draft base
            classes = logits.argmax(axis=-1)
            exp = np.exp(logits - logits.max(axis=-1, keepdims=True))
            probs = exp / exp.sum(axis=-1, keepdims=True)
            out = []
            qual_out = []
            depth_floor = max(1, self.min_depth)
            for i in range(len(classes)):
                if pile.depth[i] < depth_floor:
                    if pile.positions_minor[i] == 0:
                        out.append(draft[pile.positions_major[i]])
                        qual_out.append("!")
                    continue
                c = int(classes[i])
                if c != 0:
                    out.append("*ACGT"[c])
                    # phred from the class posterior (decoder_base.cpp qual)
                    err = max(1.0 - float(probs[i, c]), 1e-7)
                    q = min(int(round(-10.0 * np.log10(err))), 70)
                    qual_out.append(chr(33 + q))
            pieces.append("".join(out))
            quals.append("".join(qual_out))
            self.stats.windows += 1
        if region_end < n:
            pieces.append(draft[region_end:])
            quals.append("!" * (n - region_end))
        seq = "".join(pieces)
        return (seq, "".join(quals)) if with_quals else seq

    @staticmethod
    def _read_end(read: AlignedRead) -> int:
        import re

        length = 0
        for num, op in re.findall(r"(\d+)([MIDNSHP=X])", read.cigar):
            if op in "M=XDN":
                length += int(num)
        return read.ref_start + length

    def run(
        self,
        draft_fasta: Path | str,
        alignments_by_contig: dict[str, list[AlignedRead]],
        regions: dict | None = None,
        with_quals: bool = False,
    ):
        """[(name, polished)] for every draft contig; `regions`
        ({ctg: (start, end) | None}) restricts which contigs/spans run."""
        out = []
        for name, seq in read_fasta(draft_fasta):
            if regions is not None and name not in regions:
                continue
            span = regions.get(name) if regions else None
            start, end = span if span else (0, None)
            reads = alignments_by_contig.get(name, [])
            out.append(
                (name, self.polish_contig(seq, reads, start, end, with_quals))
            )
            self.stats.contigs += 1
        return out
