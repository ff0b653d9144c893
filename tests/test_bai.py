"""BAI index round trip: sorted-BAM writer emits a .bai
(hts_file.cpp:446-509 semantics) and region queries through it return
exactly the records a linear overlap scan finds."""

import random

import pytest

from dorado_tpu.io.bai import cigar_ref_span, read_bai, reg2bin, reg2bins
from dorado_tpu.io.bam_reader import fetch_region, iter_bam
from dorado_tpu.io.sam import SamHeader, SamRecord
from dorado_tpu.io.sorted_bam import SortedBamWriter


def _random_records(rng, n, refs):
    out = []
    for i in range(n):
        rname, rlen = refs[rng.randrange(len(refs))]
        span = rng.randrange(50, 5000)
        pos = rng.randrange(1, max(2, rlen - span))
        seq = "".join(rng.choice("ACGT") for _ in range(20))
        out.append(
            SamRecord(
                qname=f"r{i}",
                flag=0,
                rname=rname,
                pos=pos,
                mapq=30,
                cigar=f"10S{span}M10S" if rng.random() < 0.5 else f"{span}M",
                seq=seq,
                qual="I" * len(seq),
            )
        )
    # a few unmapped records exercise n_no_coor
    for i in range(5):
        out.append(SamRecord(qname=f"u{i}", flag=4))
    return out


@pytest.mark.parametrize("max_buffered", [10_000, 37])  # in-memory and spill
def test_bai_region_queries_match_linear_scan(tmp_path, max_buffered):
    rng = random.Random(7)
    refs = [("chr1", 1_000_000), ("chr2", 250_000)]
    header = SamHeader()
    header.references = list(refs)
    recs = _random_records(rng, 300, refs)

    bam = tmp_path / "x.bam"
    bai = tmp_path / "x.bam.bai"
    with open(bam, "wb") as fh:
        w = SortedBamWriter(
            fh, header, max_buffered=max_buffered, index_path=bai
        )
        for r in recs:
            w.write(r)
        w.close()
    assert bai.exists()

    with open(bai, "rb") as fh:
        bins, linear, n_no_coor = read_bai(fh)
    assert n_no_coor == 5
    assert set(bins) == {0, 1}

    stored = list(iter_bam(bam))
    for _ in range(25):
        rname, rlen = refs[rng.randrange(len(refs))]
        beg = rng.randrange(0, rlen - 1)
        end = min(rlen, beg + rng.randrange(1, 50_000))
        got = {r.qname for r in fetch_region(bam, rname, beg, end)}
        want = {
            r.qname
            for r in stored
            if r.rname == rname
            and r.pos > 0
            and (r.pos - 1) < end
            and (r.pos - 1) + cigar_ref_span(r.cigar) > beg
        }
        assert got == want, (rname, beg, end)


def test_reg2bin_spec_values():
    # spec: bin of a whole-chromosome interval is 0; 16kb leaf windows 4681+
    assert reg2bin(0, 1 << 29) == 0
    assert reg2bin(0, 1) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    # reg2bins always includes every ancestor of the leaf
    bins = reg2bins(123_456, 123_457)
    assert 0 in bins and reg2bin(123_456, 123_457) in bins


def test_query_chunks_clamps_past_512mb(tmp_path):
    """An 'until end of contig' sentinel beyond the 512 Mbp BAI address
    space must not pull in the metadata pseudo-bin (htslib clamps too)."""
    import random

    from dorado_tpu.io.sam import SamHeader, SamRecord
    from dorado_tpu.io.sorted_bam import SortedBamWriter

    header = SamHeader()
    header.references = [("chr1", 1_000_000)]
    bam = tmp_path / "c.bam"
    bai = tmp_path / "c.bam.bai"
    with open(bam, "wb") as fh:
        w = SortedBamWriter(fh, header, index_path=bai)
        w.write(SamRecord(qname="m0", flag=0, rname="chr1", pos=901_000,
                          mapq=30, cigar="100M", seq="A" * 100,
                          qual="I" * 100))
        # a placed-unmapped record populates the metadata counts
        w.write(SamRecord(qname="u0", flag=4, rname="chr1", pos=901_500,
                          mapq=0, cigar="*", seq="A", qual="I"))
        w.close()
    # no crash from the metadata pseudo-bin, and placed-unmapped records
    # come back like samtools view does
    got = {r.qname for r in fetch_region(bam, "chr1", 900_000, 2**31)}
    assert got == {"m0", "u0"}
