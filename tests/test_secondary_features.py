"""Dwell / snp_qv / local-haplotag feature tests
(medaka_read_matrix.cpp calculate_dwells + compute_snp_qv,
kadayashi local_haplotagging equivalence)."""

import numpy as np

from dorado_tpu.secondary.features import (
    calculate_dwells,
    compute_snp_qv,
    local_haplotags,
)
from dorado_tpu.secondary.pileup import AlignedRead
from dorado_tpu.secondary.read_matrix import build_read_matrix


class TestCalculateDwells:
    def test_forward(self):
        # mv = [stride, m1, ...]; forward skips index 1 (always a move),
        # starts dwell=1, emits at each subsequent move, and the trailing
        # samples accrue to the final base (medaka_read_matrix.cpp:113-140)
        # moves at sample idx: 1 (base0), 3 (base1), 4 (base2); 6 samples
        mv = [5, 1, 0, 1, 1, 0]
        out = calculate_dwells(mv, 3, is_reverse=False)
        # base0: samples 1,2 -> dwell 2; base1: sample 3 -> 1;
        # base2: samples 4,5 -> 2 (trailing)
        assert out.tolist() == [2, 1, 2]

    def test_reverse(self):
        # reverse walks the table backwards; the last move is the first base
        mv = [5, 1, 0, 1, 1, 0]
        out = calculate_dwells(mv, 3, is_reverse=True)
        # backwards over indices 5..1: dwells accumulate until each 1
        # idx5(0):d=1; idx4(1): base0=2... wait recompute:
        # i=5 m=0 d=1; i=4 m=1 -> base0 d=2? no: d increments then emit.
        # i=5: d=1, m=0; i=4: d=2, m=1 -> out[0]=2, d=0; i=3: d=1, m=1 ->
        # out[1]=1, d=0; i=2: d=1, m=0; i=1: d=2, m=1 -> out[2]=2
        assert out.tolist() == [2, 1, 2]

    def test_no_tag_gives_zeros(self):
        out = calculate_dwells(None, 4, is_reverse=False)
        assert out.tolist() == [0, 0, 0, 0]

    def test_bad_alignment_returns_none(self):
        # more moves than bases -> BAD_ALIGNMENT (None)
        mv = [5, 1, 1, 1, 1]
        assert calculate_dwells(mv, 2, is_reverse=False) is None

    def test_clamps_at_127(self):
        mv = [5, 1] + [0] * 300 + [1]
        out = calculate_dwells(mv, 2, is_reverse=False)
        assert out[0] == 127


class TestSnpQv:
    def test_exact_from_x_ops(self):
        # 99 matches 1 mismatch -> acc 0.99 -> qv 20
        assert compute_snp_qv("49=1X50=") == 20

    def test_m_cigar_with_nm(self):
        # NM=3 with 1 ins 1 del -> 1 substitution over 100 M
        assert compute_snp_qv("50M1I25M1D25M", nm=3) == 20

    def test_perfect_capped_at_60(self):
        assert compute_snp_qv("100=") == 60
        assert compute_snp_qv("100M", nm=0) == 60

    def test_no_matches(self):
        assert compute_snp_qv("10I") == 0


def _hap_reads(n_per_hap=6, seed=0):
    """Two haplotypes differing at positions 10/20/30 (A/C alleles)."""
    rng = np.random.default_rng(seed)
    base = list("ACGTACGTAC" * 5)  # 50 bp
    reads = []
    truth = []
    for h in (0, 1):
        allele = "A" if h == 0 else "C"
        for _ in range(n_per_hap):
            seq = list(base)
            for p in (10, 20, 30):
                seq[p] = allele
            # sprinkle random errors away from the het sites
            for p in rng.choice([3, 7, 15, 25, 35, 44], size=2, replace=False):
                seq[p] = "ACGT"[rng.integers(4)]
            reads.append(
                AlignedRead(0, "50M", "".join(seq), False, qname=f"h{h}_{len(reads)}")
            )
            truth.append(h + 1)
    return reads, truth


class TestLocalHaplotags:
    def test_two_haplotypes_partitioned(self):
        reads, truth = _hap_reads()
        tags = local_haplotags(reads, 0, 50)
        assert set(tags.values()) <= {1, 2}
        # all reads informative -> all tagged, split into the true groups
        groups = {}
        for i, h in tags.items():
            groups.setdefault(h, set()).add(truth[i])
        assert len(groups) == 2
        for members in groups.values():
            assert len(members) == 1  # no mixing

    def test_no_het_sites_no_tags(self):
        reads = [AlignedRead(0, "20M", "ACGTACGTACGTACGTACGT", False)] * 6
        assert local_haplotags(reads, 0, 20) == {}


class TestReadMatrixExtraColumns:
    def test_column_order_and_values(self):
        mv = [5, 1, 0, 1, 1, 0]  # dwells [2,1,2]
        read = AlignedRead(
            0, "1=1X1=", "ACG", False,
            qual=np.array([30, 31, 32]), mapq=42, moves=mv, haplotag=2,
        )
        rm = build_read_matrix(
            [read], 0, 3,
            include_dwells=True, include_haplotags=True, include_snp_qv=True,
        )
        # [P, D, 7]: base,qual,strand,mapq,dwell,haplotag,snp_qv
        assert rm.matrix.shape == (3, 1, 7)
        row0 = rm.matrix[0, 0]
        assert row0[0] == 1  # A
        assert row0[1] == 30
        assert row0[2] == 1
        assert row0[3] == 42
        assert rm.matrix[:, 0, 4].tolist() == [2, 1, 2]  # dwell per base
        assert (rm.matrix[:, 0, 5] == 2).all()  # HP tag broadcast
        # 1 sub / 3 matches -> qv round(-10*log10(1/3)) = 5
        assert (rm.matrix[:, 0, 6] == 5).all()

    def test_haplotags_dict_overrides_hp(self):
        read = AlignedRead(0, "2M", "AC", False, haplotag=2)
        rm = build_read_matrix(
            [read], 0, 2, include_haplotags=True, haplotags={0: 1}
        )
        assert (rm.matrix[:, 0, 4] == 1).all()

    def test_default_shape_unchanged(self):
        read = AlignedRead(0, "2M", "AC", False)
        rm = build_read_matrix([read], 0, 2)
        assert rm.matrix.shape == (2, 1, 4)
