import numpy as np
import pytest

from dorado_tpu.io.pod5 import Pod5File, find_pod5_files, iter_reads
from dorado_tpu.io.vbz import (
    compress_signal,
    decompress_signal,
    svb16_decode,
    svb16_encode,
)


class TestVbz:
    @pytest.mark.parametrize("n", [1, 7, 8, 9, 1000, 4096])
    def test_svb16_roundtrip(self, n):
        rng = np.random.default_rng(n)
        sig = rng.integers(-2000, 3000, n).astype(np.int16)
        assert np.array_equal(svb16_decode(svb16_encode(sig), n), sig)

    def test_vbz_roundtrip(self):
        rng = np.random.default_rng(0)
        # realistic: smooth-ish signal with small deltas
        sig = (np.cumsum(rng.integers(-30, 30, 50000)) + 800).astype(np.int16)
        blob = compress_signal(sig)
        assert len(blob) < sig.nbytes  # actually compresses
        assert np.array_equal(decompress_signal(blob, len(sig)), sig)

    def test_empty(self):
        assert svb16_decode(b"", 0).size == 0


class TestPod5File:
    def test_single_read(self, reference_pod5_dir):
        path = (
            reference_pod5_dir
            / "dna_r10.4.1_e8.2_400bps_5khz"
            / "dna_r10.4.1_e8.2_400bps_5khz-FLO_PRO114M-SQK_LSK114_XL-5000.pod5"
        )
        f = Pod5File(path)
        assert f.num_reads == 1
        read = f.get_read(0)
        assert read.read_id == "c9d52049-ce91-491c-8b19-3ae940f9f020"
        assert read.signal.dtype == np.int16
        assert read.signal.shape == (2048,)
        assert read.run_info.sample_rate == 5000
        assert read.run_info.flow_cell_product_code == "FLO-PRO114M"

    def test_multi_read(self):
        from tests.conftest import REFERENCE_ROOT

        path = REFERENCE_ROOT / "tests/data/multi_read_pod5/filtered.pod5"
        if not path.exists():
            pytest.skip("fixture missing")
        f = Pod5File(path)
        assert f.num_reads == 4
        reads = list(f.reads())
        assert all(r.signal.size > 90000 for r in reads)
        assert all(r.run_info.sample_rate == 4000 for r in reads)
        # signal in plausible ADC range
        for r in reads:
            assert -5000 < int(r.signal.min()) and int(r.signal.max()) < 10000

    def test_find_and_iter(self, reference_pod5_dir):
        files = find_pod5_files(reference_pod5_dir / "dna_r10.4.1_e8.2_400bps_5khz")
        assert len(files) >= 3
        reads = list(iter_reads(files[:2]))
        assert len(reads) == 2

    def test_by_channel_order(self):
        from tests.conftest import REFERENCE_ROOT

        path = (
            REFERENCE_ROOT / "tests/data/single_channel_multi_read_pod5"
        )
        files = find_pod5_files(path, recursive=True)
        if not files:
            pytest.skip("fixture missing")
        reads = list(iter_reads(files, by_channel=True))
        chans = [r.channel for r in reads]
        assert chans == sorted(chans)


def test_reads_every_reference_fixture():
    """Every checked-in POD5 (incl. the degenerate trimming fixtures and
    multi-read files) parses and yields complete reads."""
    from pathlib import Path

    from dorado_tpu.io.pod5 import Pod5File

    files = sorted(Path("/root/reference/tests/data").rglob("*.pod5"))
    assert len(files) >= 25
    total = 0
    for p in files:
        for read in Pod5File(p).reads():
            assert read.read_id
            assert read.signal.dtype.kind in "if"
            assert len(read.signal) > 0
            total += 1
    assert total >= 40


def test_svb16_native_matches_numpy_fuzz():
    """The C fast path (native/vbz.cpp) and the numpy reference decode
    identically across zigzag/delta modes and ragged lengths."""
    import numpy as np

    from dorado_tpu.io.vbz import _svb16_decode_numpy, svb16_encode
    from dorado_tpu.native import svb16_decode_native

    rs = np.random.RandomState(3)
    for _ in range(40):
        n = int(rs.randint(0, 3000))
        sig = (rs.randn(n) * rs.randint(1, 60)).cumsum().astype(np.int16)
        for zigzag in (False, True):
            for delta in (False, True):
                enc = svb16_encode(sig, zigzag=zigzag, delta=delta)
                a = svb16_decode_native(enc, n, zigzag=zigzag, delta=delta)
                b = _svb16_decode_numpy(enc, n, zigzag=zigzag, delta=delta)
                np.testing.assert_array_equal(a, b)
                np.testing.assert_array_equal(a, sig)


def test_fast5_rejected_with_pointer(tmp_path):
    """FAST5-only inputs error with the conversion pointer
    (DataLoader.cpp:50-58); mixed inputs warn and proceed."""
    import pytest as _pytest

    from dorado_tpu.io.pod5 import find_pod5_files

    (tmp_path / "old.fast5").write_bytes(b"\x89HDF")
    with _pytest.raises(RuntimeError, match="convert your dataset to POD5"):
        find_pod5_files(tmp_path)


class TestFaultTolerance:
    """Per-read decode-error resilience (DataLoader.cpp:76-93: log + skip a
    bad row, keep basecalling the rest)."""

    @staticmethod
    def _corrupt_one_read(tmp_path, row: int = 0):
        from tests.conftest import REFERENCE_ROOT

        src = REFERENCE_ROOT / "tests/data/multi_read_pod5/filtered.pod5"
        if not src.exists():
            pytest.skip("fixture missing")
        data = bytearray(src.read_bytes())
        f = Pod5File(src)
        sig_row = int(f._reads["signal"][row].as_py()[0])
        blob = bytes(f._signal["signal"][sig_row].as_py())
        off = bytes(data).find(blob)
        assert off > 0
        # trash the zstd frame header so decompression raises deterministically
        # (mid-frame flips can land in raw literals and decode "successfully")
        for i in range(off, off + 8):
            data[i] ^= 0xFF
        out = tmp_path / "corrupt.pod5"
        out.write_bytes(bytes(data))
        return out, f.num_reads

    def test_reads_skips_corrupt_row(self, tmp_path):
        path, n = self._corrupt_one_read(tmp_path)
        f = Pod5File(path)
        good = list(f.reads())
        assert len(good) == n - 1
        assert f.reads_skipped == 1
        for r in good:
            assert len(r.signal) > 0

    def test_strict_raises(self, tmp_path):
        path, _ = self._corrupt_one_read(tmp_path)
        f = Pod5File(path)
        with pytest.raises(Exception):
            list(f.reads(strict=True))
