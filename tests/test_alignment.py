"""From-scratch aligner tests: minimizer properties, index lookup, and
mapping accuracy on simulated reads (position/strand/cigar correctness)."""

import numpy as np
import pytest

from dorado_tpu.alignment import Mapper, ReferenceIndex
from dorado_tpu.alignment.minimizer import encode_seq, minimizers
from dorado_tpu.utils import reverse_complement


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


class TestMinimizers:
    def test_deterministic_and_sorted(self):
        rng = np.random.RandomState(0)
        seq = _rand_seq(rng, 5000)
        h1, p1, s1 = minimizers(seq)
        h2, p2, s2 = minimizers(seq)
        assert np.array_equal(p1, p2)
        assert np.all(np.diff(p1) > 0)
        # density ~ 2/(w+1) per base
        assert 2 * len(seq) / 11 * 0.5 < len(p1) < 2 * len(seq) / 11 * 2

    def test_strand_symmetry(self):
        """A sequence and its RC share the same canonical minimizer hashes."""
        rng = np.random.RandomState(1)
        seq = _rand_seq(rng, 2000)
        h_f, _, _ = minimizers(seq)
        h_r, _, _ = minimizers(reverse_complement(seq))
        # most hashes shared (window boundaries differ slightly)
        shared = np.intersect1d(h_f, h_r)
        assert len(shared) > 0.8 * min(len(h_f), len(h_r))

    def test_n_handling(self):
        seq = "ACGT" * 10 + "N" * 20 + "TGCA" * 10
        h, p, s = minimizers(seq, k=7, w=4)
        # no minimizer window overlaps the N run
        for pos in p:
            assert "N" not in seq[pos : pos + 7]


@pytest.fixture(scope="module")
def ref_and_mapper():
    rng = np.random.RandomState(42)
    contigs = [("chr1", _rand_seq(rng, 20000)), ("chr2", _rand_seq(rng, 8000))]
    idx = ReferenceIndex.build(contigs)
    return contigs, Mapper(idx)


def _mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.rand()
        if r < rate / 3:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < 2 * rate / 3:
            continue
        elif r < rate:
            out.append(c)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


class TestMapper:
    def test_exact_reads(self, ref_and_mapper):
        contigs, mapper = ref_and_mapper
        rng = np.random.RandomState(0)
        for _ in range(10):
            cid = rng.randint(2)
            name, ref = contigs[cid]
            start = rng.randint(0, len(ref) - 1000)
            read = ref[start : start + 1000]
            alns = mapper.map(read)
            assert alns, "exact read must map"
            a = alns[0]
            assert a.ref_name == name
            assert abs(a.ref_start - start) < 50
            assert not a.is_reverse
            assert a.nm == 0

    def test_reverse_strand(self, ref_and_mapper):
        contigs, mapper = ref_and_mapper
        name, ref = contigs[0]
        read = reverse_complement(ref[5000:6200])
        alns = mapper.map(read)
        assert alns
        a = alns[0]
        assert a.ref_name == name
        assert a.is_reverse
        assert abs(a.ref_start - 5000) < 50

    def test_noisy_reads(self, ref_and_mapper):
        contigs, mapper = ref_and_mapper
        rng = np.random.RandomState(7)
        mapped = 0
        for _ in range(10):
            name, ref = contigs[0]
            start = rng.randint(0, len(ref) - 2000)
            read = _mutate(rng, ref[start : start + 2000], 0.10)  # ~nanopore error
            alns = mapper.map(read)
            if alns and alns[0].ref_name == name and abs(alns[0].ref_start - start) < 100:
                mapped += 1
        assert mapped >= 9

    def test_unmappable(self, ref_and_mapper):
        _, mapper = ref_and_mapper
        rng = np.random.RandomState(9)
        random_read = _rand_seq(rng, 500)
        alns = mapper.map(random_read)
        assert alns == []

    def test_cigar_consistency(self, ref_and_mapper):
        contigs, mapper = ref_and_mapper
        rng = np.random.RandomState(3)
        name, ref = contigs[0]
        read = _mutate(rng, ref[1000:2500], 0.05)
        a = mapper.map(read)[0]
        # CIGAR query length must equal read length
        import re

        qlen = sum(
            int(n) for n, op in re.findall(r"(\d+)([MIDNSHP=X])", a.cigar) if op in "MIS=X"
        )
        assert qlen == len(read)
