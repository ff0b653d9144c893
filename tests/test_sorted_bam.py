"""Sorted BAM writer with spill-to-disk merge (hts_file.h sort_bam mode)."""

import numpy as np
import pytest

from dorado_tpu.io.bam_reader import read_bam
from dorado_tpu.io.sam import SamHeader, SamRecord
from dorado_tpu.io.sorted_bam import SortedBamWriter


def make_records(rng, n, n_refs=3):
    recs = []
    for i in range(n):
        mapped = rng.rand() > 0.2
        recs.append(
            SamRecord(
                qname=f"r{i}",
                seq="ACGT",
                qual="IIII",
                rname=f"ctg{rng.randint(n_refs)}" if mapped else "*",
                pos=int(rng.randint(1, 10000)) if mapped else 0,
                flag=0 if mapped else 4,
            )
        )
    return recs


@pytest.mark.parametrize("max_buffered", [10_000, 37])  # in-memory vs spill
def test_sorted_output(tmp_path, max_buffered):
    rng = np.random.RandomState(0)
    header = SamHeader()
    header.references = [(f"ctg{i}", 10000) for i in range(3)]
    out = tmp_path / "sorted.bam"
    with open(out, "wb") as fh:
        w = SortedBamWriter(fh, header, max_buffered=max_buffered, tmp_dir=str(tmp_path))
        recs = make_records(rng, 500)
        for rec in recs:
            w.write(rec)
        w.close()

    data = read_bam(out)
    assert "SO:coordinate" in data.header_text
    got = data.records
    assert len(got) == 500
    order = {f"ctg{i}": i for i in range(3)}
    keys = [
        (order.get(r.rname, 1 << 30), max(r.pos - 1, 0)) for r in got
    ]
    assert keys == sorted(keys)
    # unmapped records all sort at the end
    unmapped_start = next(
        (i for i, r in enumerate(got) if r.rname == "*"), len(got)
    )
    assert all(r.rname == "*" for r in got[unmapped_start:])
    # no temp files left behind
    assert not list(tmp_path.glob("*.tmp.bam"))
