"""Variant calling from polishing model output + VCF writing.

Parity targets: dorado/secondary/consensus/variant_calling.cpp (variants as
differences between the model consensus and the draft over pileup columns)
and dorado/secondary/common/vcf_writer.cpp (VCFv4.1 text output with
GT/GQ sample fields).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TextIO

import numpy as np

from dorado_tpu.secondary.model import SYMBOLS


@dataclass
class Variant:
    contig: str
    pos: int  # 0-based
    ref: str
    alts: list[str]
    qual: float = 0.0
    filter: str = "PASS"
    genotype: list[tuple[str, str]] = field(default_factory=list)

    @property
    def is_valid(self) -> bool:
        return bool(self.ref) or any(self.alts)


def call_variants(
    draft: str,
    contig: str,
    logits: np.ndarray,  # [P, num_classes]
    positions_major: np.ndarray,
    positions_minor: np.ndarray,
) -> list[Variant]:
    """Haploid variant extraction: where the model's argmax consensus differs
    from the draft base at each pileup column, group contiguous differing
    columns into one variant record (substitution / insertion / deletion)."""
    classes = np.asarray(logits).argmax(axis=-1)
    probs = _softmax(np.asarray(logits, dtype=np.float64))
    n = len(classes)

    variants: list[Variant] = []
    i = 0
    while i < n:
        pred = SYMBOLS[classes[i]]
        is_minor = positions_minor[i] > 0
        draft_base = "*" if is_minor else draft[positions_major[i]]
        if pred == draft_base:
            i += 1
            continue
        # group a run of differing columns
        j = i
        quals = []
        while j < n:
            p_sym = SYMBOLS[classes[j]]
            d_sym = "*" if positions_minor[j] > 0 else draft[positions_major[j]]
            if p_sym == d_sym:
                break
            quals.append(probs[j, classes[j]])
            j += 1
        ref_positions = [
            int(positions_major[t]) for t in range(i, j) if positions_minor[t] == 0
        ]
        ref = "".join(draft[p] for p in ref_positions)
        alt = "".join(SYMBOLS[classes[t]] for t in range(i, j)).replace("*", "")
        pos = ref_positions[0] if ref_positions else int(positions_major[i])
        if not ref:
            # pure insertion: it follows its minor columns' major position,
            # which is the VCF anchor base
            pos = int(positions_major[i])
            ref = draft[pos]
            alt = ref + alt
        elif not alt:
            # deletion: VCF requires the anchor base before the event
            if pos > 0:
                anchor = draft[pos - 1]
                ref = anchor + ref
                alt = anchor + alt
                pos -= 1
            else:
                i = j
                continue
        if ref == alt:
            i = j
            continue
        err = max(1e-10, 1.0 - float(np.mean(quals)) if quals else 0.5)
        qual = min(70.0, -10.0 * np.log10(err))
        variants.append(
            Variant(
                contig=contig,
                pos=pos,
                ref=ref,
                alts=[alt],
                qual=float(qual),
                genotype=[("GT", "1"), ("GQ", str(int(qual)))],
            )
        )
        i = j
    return variants


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class VcfWriter:
    """VCFv4.1 text writer (vcf_writer.cpp:40-90 header layout). With
    ``gvcf=True`` the header declares the END/MIN_DP fields used by
    hom-reference blocks."""

    def __init__(self, stream: TextIO, contigs: list[tuple[str, int]], gvcf: bool = False):
        self._fh = stream
        self._fh.write("##fileformat=VCFv4.1\n")
        for name, length in contigs:
            self._fh.write(f"##contig=<ID={name},length={length}>\n")
        self._fh.write('##FILTER=<ID=PASS,Description="All filters passed">\n')
        if gvcf:
            self._fh.write(
                '##INFO=<ID=END,Number=1,Type=Integer,Description='
                '"End position of the homozygous-reference block">\n'
            )
        self._fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        self._fh.write(
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">\n'
        )
        self._fh.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE\n"
        )
        self.records_written = 0

    def write_ref_block(self, contig: str, start: int, end: int, ref_base: str,
                        gq: int = 50) -> None:
        """gVCF homozygous-reference block covering [start, end) (0-based)."""
        self._fh.write(
            f"{contig}\t{start + 1}\t.\t{ref_base}\t.\t.\tPASS\t"
            f"END={end}\tGT:GQ\t0|0:{gq}\n"
        )
        self.records_written += 1

    def write(self, v: Variant) -> None:
        fmt_keys = ":".join(k for k, _ in v.genotype) or "GT"
        fmt_vals = ":".join(val for _, val in v.genotype) or "."
        self._fh.write(
            f"{v.contig}\t{v.pos + 1}\t.\t{v.ref}\t{','.join(v.alts) or '.'}\t"
            f"{v.qual:.1f}\t{v.filter}\t.\t{fmt_keys}\t{fmt_vals}\n"
        )
        self.records_written += 1


def call_variants_diploid(
    draft: str,
    contig: str,
    probs2: np.ndarray,  # [P, 2, num_classes] per-haplotype probabilities
    positions_major: np.ndarray,
    positions_minor: np.ndarray,
) -> list[Variant]:
    """Diploid variant extraction from two-haplotype model output (the
    SlotAttentionConsensus / VariantPerceiver heads): group pileup columns
    where either haplotype's argmax differs from the draft, emit one VCF
    record with a phased GT over the distinct alleles
    (consensus/variant_calling.cpp diploid path semantics)."""
    probs2 = np.asarray(probs2, dtype=np.float64)
    classes = probs2.argmax(axis=-1)  # [P, 2]
    n = len(classes)

    variants: list[Variant] = []
    i = 0
    while i < n:
        d_sym = "*" if positions_minor[i] > 0 else draft[positions_major[i]]
        if SYMBOLS[classes[i, 0]] == d_sym and SYMBOLS[classes[i, 1]] == d_sym:
            i += 1
            continue
        j = i
        quals = []
        while j < n:
            d = "*" if positions_minor[j] > 0 else draft[positions_major[j]]
            h0, h1 = SYMBOLS[classes[j, 0]], SYMBOLS[classes[j, 1]]
            if h0 == d and h1 == d:
                break
            quals.append(float(probs2[j, 0, classes[j, 0]]))
            quals.append(float(probs2[j, 1, classes[j, 1]]))
            j += 1
        ref_positions = [
            int(positions_major[t]) for t in range(i, j) if positions_minor[t] == 0
        ]
        ref = "".join(draft[p] for p in ref_positions)
        hap_seqs = [
            "".join(SYMBOLS[classes[t, h]] for t in range(i, j)).replace("*", "")
            for h in (0, 1)
        ]
        pos = ref_positions[0] if ref_positions else int(positions_major[i])
        if not ref:
            # pure insertion: anchor on the preceding major base
            pos = int(positions_major[i])
            ref = draft[pos]
            hap_seqs = [ref + h for h in hap_seqs]
        elif any(not h for h in hap_seqs):
            # deletion on at least one haplotype: prepend the anchor base
            if pos > 0:
                anchor = draft[pos - 1]
                ref = anchor + ref
                hap_seqs = [anchor + h for h in hap_seqs]
                pos -= 1
            else:
                i = j
                continue

        # allele table: 0 = REF, then distinct ALTs in haplotype order
        alts: list[str] = []
        gt_idx = []
        for h in hap_seqs:
            if h == ref:
                gt_idx.append(0)
            else:
                if h not in alts:
                    alts.append(h)
                gt_idx.append(1 + alts.index(h))
        if not alts:
            i = j
            continue
        err = max(1e-10, 1.0 - float(np.mean(quals)) if quals else 0.5)
        qual = min(70.0, -10.0 * np.log10(err))
        variants.append(
            Variant(
                contig=contig,
                pos=pos,
                ref=ref,
                alts=alts,
                qual=float(qual),
                genotype=[
                    ("GT", f"{gt_idx[0]}|{gt_idx[1]}"),
                    ("GQ", str(int(qual))),
                ],
            )
        )
        i = j
    return variants
