"""rANS codec tests: 4x8 and Nx16 round-trips plus full-file parity of the
CRAM reader against htslib-written fixtures (the reference's CRAM output
path, hts_utils/hts_file.cpp, writes rANS blocks via htscodecs).

Ground truth: the regression-test BAMs next to each CRAM fixture
(/root/reference/regression_test/ref/linux/...), produced by the same dorado
run — every seq/qual/tag must match record-for-record.
"""

from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.io.rans import (
    ORDER_CAT,
    ORDER_PACK,
    rans4x8_decode,
    rans4x8_encode,
    ransNx16_decode,
    ransNx16_encode,
)

REF = Path("/root/reference/regression_test/ref/linux")

FIXTURES = [
    ("basecalling/Kit14_hac_cram", "basecalling/Kit14_hac"),
    ("basecalling/Kit14_RNA_hac_cram", "basecalling/Kit14_RNA_hac"),
    (
        "modified_basecalling/HAC_m6A_DRACH_pseU_cram",
        "modified_basecalling/HAC_m6A_DRACH_pseU",
    ),
    (
        "modified_basecalling/SUP_4mC_5mC_6mA_cram",
        "modified_basecalling/SUP_4mC_5mC_6mA",
    ),
]


def _payloads():
    """Realistic byte streams shaped like CRAM series."""
    rng = np.random.RandomState(42)
    quals = (rng.gamma(4, 3, 50000).clip(0, 50)).astype(np.uint8).tobytes()
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), 10000).astype(np.uint8).tobytes()
    runs = b"".join(bytes([b]) * n for b, n in zip(rng.randint(0, 255, 200), rng.randint(1, 40, 200)))
    return {
        "quals": quals,
        "bases": bases,
        "runs": runs,
        "empty": b"",
        "single": b"x" * 500,
        "tiny": b"ab",
        "odd": bytes(rng.randint(0, 256, 1001, dtype=np.uint8)),
    }


class TestRans4x8:
    @pytest.mark.parametrize("name", ["quals", "bases", "runs", "single", "odd"])
    @pytest.mark.parametrize("order", [0, 1])
    def test_roundtrip(self, name, order):
        data = _payloads()[name]
        enc = rans4x8_encode(data, order=order)
        assert rans4x8_decode(enc) == data

    def test_compresses(self):
        data = _payloads()["quals"]
        assert len(rans4x8_encode(data, order=1)) < int(len(data) * 0.7)


class TestRansNx16:
    @pytest.mark.parametrize("name", ["quals", "bases", "runs", "empty", "single", "tiny", "odd"])
    def test_roundtrip(self, name):
        data = _payloads()[name]
        enc = ransNx16_encode(data)
        assert ransNx16_decode(enc) == data

    def test_single_symbol_packs(self):
        enc = ransNx16_encode(b"z" * 10000)
        assert len(enc) < 16
        assert enc[0] & (ORDER_PACK | ORDER_CAT)
        assert ransNx16_decode(enc) == b"z" * 10000


@pytest.mark.skipif(not REF.is_dir(), reason="no reference regression fixtures")
class TestHtslibCramParity:
    """Read htslib-written CRAMs (rANS Nx16 blocks: O0, O1, O1+X32, PACK,
    RLE, CAT, STRIPE all occur across these four files) and compare every
    record against the matching BAM."""

    @pytest.mark.parametrize("cram_dir,bam_dir", FIXTURES)
    def test_record_parity(self, cram_dir, bam_dir):
        from dorado_tpu.io.bam_reader import read_records
        from dorado_tpu.io.cram import CramReader

        cram_path = REF / cram_dir / "out.cram"
        bam_path = REF / bam_dir / "out.bam"
        if not (cram_path.exists() and bam_path.exists()):
            pytest.skip("fixture missing")
        cram = {r.qname: r for r in CramReader(cram_path).records()}
        _, recs = read_records(bam_path)
        bam = {r.qname: r for r in recs}
        assert set(cram) == set(bam) and len(cram) > 0
        for q, c in cram.items():
            b = bam[q]
            assert c.seq == b.seq
            assert c.qual == b.qual
            def norm(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    return [int(x) for x in v]
                return v

            ctags = {t.tag: (t.type, norm(t.value)) for t in c.tags}
            btags = {t.tag: (t.type, norm(t.value)) for t in b.tags}
            assert ctags == btags
