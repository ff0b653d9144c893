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


REF_CORRECTION = "/root/reference/tests/data/read_correction"


def _load_fastx(path):
    out = []
    name, seq = None, []
    with open(path) as fh:
        lines = fh.read().splitlines()
    if lines and lines[0].startswith("@"):  # fastq
        for i in range(0, len(lines), 4):
            out.append((lines[i][1:].split()[0], lines[i + 1]))
        return out
    for line in lines:
        if line.startswith(">"):
            if name is not None:
                out.append((name, "".join(seq)))
            name, seq = line[1:].split()[0], []
        else:
            seq.append(line)
    if name is not None:
        out.append((name, "".join(seq)))
    return out


@pytest.mark.skipif(
    not __import__("pathlib").Path(REF_CORRECTION).is_dir(),
    reason="reference fixtures unavailable",
)
class TestRealDataParity:
    """Map the reference's real ONT reads (49-68 kb, read_correction/reads.fq)
    against their reference contig and compare primary alignments with the
    checked-in minimap2 results (expected.alignment_summary.txt: genome
    start/end, strand, mapq 60 primaries). The summary's positions are for
    the *corrected* reads; raw-read primaries must agree in strand and land
    within a small tolerance of the same loci."""

    @pytest.fixture(scope="class")
    def expected(self):
        rows = {}
        with open(f"{REF_CORRECTION}/expected.alignment_summary.txt") as fh:
            header = fh.readline().rstrip("\n").split("\t")
            for line in fh:
                vals = dict(zip(header, line.rstrip("\n").split("\t")))
                rows[vals["read_id"]] = vals
        return rows

    @pytest.fixture(scope="class")
    def primaries(self):
        ref = _load_fastx(f"{REF_CORRECTION}/ref.fasta")
        reads = _load_fastx(f"{REF_CORRECTION}/reads.fq")
        index = ReferenceIndex.build(ref)
        mapper = Mapper(index)
        out = {}
        for name, seq in reads:
            alns = mapper.map(seq)
            out[name] = alns[0] if alns else None
        return out

    def test_all_reads_map(self, primaries):
        assert all(a is not None for a in primaries.values())

    def test_position_and_strand_agreement(self, expected, primaries):
        # the expected summary comes from the *corrected* reads, which are
        # 20-40 kb shorter than the raw reads mapped here — so the raw
        # primary must land on the same strand and *contain* the corrected
        # read's interval (within tolerance at the trimmed ends)
        agree = 0
        for rid, exp in expected.items():
            a = primaries.get(rid)
            assert a is not None, rid
            exp_rev = exp["alignment_direction"] == "-"
            exp_start = int(exp["alignment_genome_start"])
            exp_end = int(exp["alignment_genome_end"])
            ok = (
                a.is_reverse == exp_rev
                and a.ref_start <= exp_start + 200
                and a.ref_end >= exp_end - 200
            )
            if ok:
                agree += 1
        # VERDICT round-1 bar: >= 95% primary position agreement
        assert agree / len(expected) >= 0.95, f"{agree}/{len(expected)}"

    def test_mapq_confident(self, expected, primaries):
        # minimap2 gives all six primaries mapq 60 (unique hits); ours must
        # also mark them high-confidence
        for rid in expected:
            assert primaries[rid].mapq >= 30, rid

    def test_coverage_reasonable(self, expected, primaries):
        # the aligned query span must cover at least as much sequence as
        # minimap2 aligned for the corrected read (the raw read contains it,
        # plus unalignable overhang carried as soft clips)
        for rid, a in primaries.items():
            exp = expected[rid]
            exp_span = int(exp["alignment_genome_end"]) - int(
                exp["alignment_genome_start"]
            )
            cov = (a.q_end - a.q_start) / exp_span
            assert cov >= 0.90, (rid, cov)
