"""End-to-end simplex pipeline tests: POD5 -> engine -> BAM/SAM/FASTQ.

Uses a fabricated model dir (real reference config.toml + random weights in
the dorado on-disk layout) over real reference POD5 fixtures. With random
weights the bases are meaningless, but every structural contract is checked:
chunking/stitching consistency (move table sums = sequence length), tag set,
BAM binary round-trip, throughput stats.
"""

import io
import shutil
import struct
import subprocess
import sys
import zlib
from pathlib import Path

import jax
import numpy as np
import pytest

from dorado_tpu.config import load_model_config
from dorado_tpu.io.pod5 import find_pod5_files
from dorado_tpu.io.sam import BamWriter, SamWriter
from dorado_tpu.models.crf_model import init_lstm_crf_params
from dorado_tpu.models.load import load_model, save_lstm_params
from dorado_tpu.pipeline.basecaller import BasecallerPipeline

REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
HAC = "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"
POD5_DIR = Path("/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz")


@pytest.fixture(scope="module")
def fast_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fastmodel") / FAST
    d.mkdir()
    shutil.copy(REF_CONFIGS / FAST / "config.toml", d / "config.toml")
    config = load_model_config(d)
    params = init_lstm_crf_params(config, jax.random.PRNGKey(1))
    save_lstm_params(config, params, d)
    return d


def _decode_bam(path: Path):
    """Minimal BGZF+BAM parser returning (header_text, records)."""
    raw = b""
    data = path.read_bytes()
    pos = 0
    while pos < len(data):
        assert data[pos : pos + 2] == b"\x1f\x8b"
        xlen = struct.unpack("<H", data[pos + 10 : pos + 12])[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        epos = 0
        while epos < len(extra):
            si1, si2, slen = extra[epos], extra[epos + 1], struct.unpack("<H", extra[epos + 2 : epos + 4])[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack("<H", extra[epos + 4 : epos + 6])[0] + 1
            epos += 4 + slen
        cdata = data[pos + 12 + xlen : pos + bsize - 8]
        raw += zlib.decompress(cdata, -15)
        pos += bsize
    assert raw[:4] == b"BAM\x01"
    l_text = struct.unpack("<i", raw[4:8])[0]
    text = raw[8 : 8 + l_text].decode()
    p = 8 + l_text
    n_ref = struct.unpack("<i", raw[p : p + 4])[0]
    p += 4
    for _ in range(n_ref):
        l_name = struct.unpack("<i", raw[p : p + 4])[0]
        p += 4 + l_name + 4
    records = []
    while p < len(raw):
        block_size = struct.unpack("<i", raw[p : p + 4])[0]
        block = raw[p + 4 : p + 4 + block_size]
        l_read_name = block[8]
        n_cigar = struct.unpack("<H", block[12:14])[0]
        l_seq = struct.unpack("<i", block[16:20])[0]
        name = block[32 : 32 + l_read_name - 1].decode()
        q = 32 + l_read_name + 4 * n_cigar
        nib = block[q : q + (l_seq + 1) // 2]
        seq = ""
        lut = "=ACMGRSVTWYHKDBN"
        for i in range(l_seq):
            b = nib[i // 2]
            seq += lut[(b >> 4) if i % 2 == 0 else (b & 0xF)]
        q += (l_seq + 1) // 2
        qual = bytes(c + 33 for c in block[q : q + l_seq]).decode()
        records.append({"name": name, "seq": seq, "qual": qual, "aux": block[q + l_seq :]})
        p += 4 + block_size
    return text, records


def _aux_tags(aux: bytes) -> dict:
    tags = {}
    p = 0
    while p < len(aux):
        tag = aux[p : p + 2].decode()
        typ = chr(aux[p + 2])
        p += 3
        if typ == "Z":
            end = aux.index(0, p)
            tags[tag] = aux[p:end].decode()
            p = end + 1
        elif typ == "f":
            tags[tag] = struct.unpack("<f", aux[p : p + 4])[0]
            p += 4
        elif typ in "iI":
            tags[tag] = struct.unpack("<i", aux[p : p + 4])[0]
            p += 4
        elif typ in "cC":
            tags[tag] = aux[p]
            p += 1
        elif typ in "sS":
            tags[tag] = struct.unpack("<h", aux[p : p + 2])[0]
            p += 2
        elif typ == "A":
            tags[tag] = chr(aux[p])
            p += 1
        elif typ == "B":
            sub = chr(aux[p])
            n = struct.unpack("<I", aux[p + 1 : p + 5])[0]
            size = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            tags[tag] = list(struct.unpack(f"<{n}{fmt}", aux[p + 5 : p + 5 + n * size]))
            p += 5 + n * size
        else:
            raise AssertionError(f"unknown tag type {typ}")
    return tags


class TestPipeline:
    @pytest.mark.parametrize("decoder", ["viterbi", "beam"])
    def test_end_to_end_bam(self, fast_model_dir, tmp_path, decoder):
        config, params = load_model(fast_model_dir)
        pipeline = BasecallerPipeline(
            config,
            params,
            chunk_size=4000,
            batch_size=4,
            decoder=decoder,
            emit_moves=True,
        )
        files = find_pod5_files(POD5_DIR)
        header = pipeline.build_header(files, cli_line="test")
        out = tmp_path / "out.bam"
        with open(out, "wb") as fh:
            writer = BamWriter(fh, header)
            stats = pipeline.run(POD5_DIR, writer)
            writer.close()

        assert stats.reads_called == 3  # one read per fixture file
        assert stats.bases_called > 0

        text, records = _decode_bam(out)
        assert "@PG" in text and "@RG" in text and "basecall_model=" in text
        assert len(records) == 3
        for rec in records:
            tags = _aux_tags(rec["aux"])
            assert len(rec["seq"]) == len(rec["qual"]) > 0
            for t in ("qs", "du", "ns", "ts", "mx", "ch", "st", "rn", "fn", "sm", "sd", "sv", "dx", "RG"):
                assert t in tags, f"missing tag {t}"
            # move table: stride first, then sum(moves) == seq length
            mv = tags["mv"]
            assert mv[0] == config.stride
            assert sum(mv[1:]) == len(rec["seq"])
            assert tags["ns"] - tags["ts"] >= 0
            assert tags["sv"] == "quantile"
            assert tags["RG"].endswith(config.model_name)

    def test_cli_sam_output(self, fast_model_dir, tmp_path):
        out = tmp_path / "out.sam"
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "dorado_tpu",
                "basecaller",
                str(fast_model_dir),
                str(POD5_DIR),
                "--emit-sam",
                "--decoder",
                "viterbi",
                "-o",
                str(out),
                "-b",
                "4",
                "-c",
                "4000",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert r.returncode == 0, r.stderr
        assert "Basecalled @ Samples/s" in r.stderr
        lines = out.read_text().splitlines()
        body = [l for l in lines if not l.startswith("@")]
        assert len(body) == 3
        for line in body:
            f = line.split("\t")
            assert f[1] == "4"  # unmapped flag
            assert len(f[9]) == len(f[10])

    def test_output_order_deterministic(self, fast_model_dir, tmp_path):
        """Whole-run output order is feed order (ordered-sink guarantee).

        All fixture reads land in one final drain group (batch_size covers
        them), so a reversed drain submit (the round-2 `finished.pop()` bug)
        flips the output order relative to the POD5 feed order."""
        config, params = load_model(fast_model_dir)
        files = find_pod5_files(POD5_DIR)
        from dorado_tpu.io.pod5 import Pod5File

        fed_order = []
        for f in files:
            for read in Pod5File(f).reads():
                fed_order.append(str(read.read_id))

        pipeline = BasecallerPipeline(
            config, params, chunk_size=4000, batch_size=8, decoder="viterbi"
        )
        header = pipeline.build_header(files, cli_line="test")
        out = tmp_path / "ordered.bam"
        with open(out, "wb") as fh:
            writer = BamWriter(fh, header)
            pipeline.run(POD5_DIR, writer)
            writer.close()
        _, records = _decode_bam(out)
        assert [r["name"] for r in records] == fed_order

    def test_stats_consistency(self, fast_model_dir):
        config, params = load_model(fast_model_dir)
        pipeline = BasecallerPipeline(
            config, params, chunk_size=4000, batch_size=4, decoder="viterbi"
        )

        class NullWriter:
            def write(self, rec):
                pass

        stats = pipeline.run(POD5_DIR, NullWriter())
        assert stats.samples_incl_padding >= stats.samples_processed
        assert stats.batches >= 1
        # stage split (per-run deltas; the gpu_profiling.h-style breakdown)
        assert stats.dispatch_wait_s > 0
        assert stats.device_fetch_s > 0
        assert stats.host_finish_s > 0
        # a second run must report fresh (not cumulative) stage times:
        # a per-run stage is a strict subset of that run's wall time
        stats2 = pipeline.run(POD5_DIR, NullWriter())
        assert stats2.device_fetch_s <= stats2.elapsed_s
        assert stats2.dispatch_wait_s <= stats2.elapsed_s

    def test_nofetch_checksum_probe(self, fast_model_dir, monkeypatch):
        """DORADO_TPU_FETCH_MODE=checksum: only a scalar leaves the device;
        the pipeline still feeds/dispatches every sample but emits no
        bases (the transport-isolation probe bench.py runs)."""
        monkeypatch.setenv("DORADO_TPU_FETCH_MODE", "checksum")
        config, params = load_model(fast_model_dir)
        pipeline = BasecallerPipeline(
            config, params, chunk_size=4000, batch_size=4, decoder="viterbi"
        )

        class NullWriter:
            def write(self, rec):
                pass

        stats = pipeline.run(POD5_DIR, NullWriter())
        assert stats.samples_processed > 0
        assert stats.bases_called == 0
        assert stats.reads_called == 3


def test_chunk_lane_ladder(monkeypatch):
    """DORADO_TPU_CHUNK_LANES extends the {T, T/2} routing to a geometric
    ladder with per-lane batch scaling (the TPU-native stand-in for the
    reference's ragged VCS packing, nn/AuxiliaryData.cpp:19-40)."""
    import jax
    import numpy as np

    from dorado_tpu.basecall.runner import BasecallRunner
    from dorado_tpu.models.crf_model import init_lstm_crf_params
    from dorado_tpu.models.presets import fast_v40_config

    monkeypatch.setenv("DORADO_TPU_CHUNK_LANES", "4")
    cfg = fast_v40_config()
    params = init_lstm_crf_params(cfg, jax.random.PRNGKey(0))
    runner = BasecallRunner(
        cfg, params, chunk_size=8000, batch_size=4, decoder="viterbi"
    )
    # ratio-3/4 ladder, granularity-aligned (fast stride 5)
    assert runner.chunk_sizes == [8000, 6000, 4500, 3375]
    # short chunks route to the smallest lane that holds them
    assert runner.lane_for(8000) == 0
    assert runner.lane_for(6001) == 0
    assert runner.lane_for(5000) == 1
    assert runner.lane_for(3000) == 3
    # per-lane batch scales inversely with chunk length (constant samples),
    # rounded up to the base-batch granule; base is mesh-rounded (4 -> 8 on
    # the virtual 8-device mesh)
    base = runner.batch_size
    sizes = [runner.lane_batch_size(i) for i in range(4)]
    assert sizes[0] == base
    for i in range(1, 4):
        want = base * 8000 / runner.chunk_sizes[i]
        assert sizes[i] % base == 0 and 0 <= sizes[i] - want < base
    # a short chunk decodes identically through its lane program
    sig = np.random.RandomState(0).randn(3000).astype(np.float32)
    buf = runner.make_input_buffer(3)
    runner.accept_chunk(buf, 0, sig)
    decoded = runner.call_chunks(buf, 1)
    assert len(decoded) == 1 and len(decoded[0].moves) == 3375 // cfg.stride


def test_int8_signal_transfer_mode(fast_model_dir, monkeypatch):
    """DORADO_TPU_SIGNAL_DTYPE=int8 (opt-in, for bandwidth-constrained
    links): quantised signal transfer must reproduce the f16 path's calls
    on real fixture reads (quantisation noise ~0.01 sigma)."""
    import numpy as np

    from dorado_tpu.basecall.runner import BasecallRunner

    config, params = load_model(fast_model_dir)

    def calls(env):
        if env:
            monkeypatch.setenv("DORADO_TPU_SIGNAL_DTYPE", "int8")
        else:
            monkeypatch.delenv("DORADO_TPU_SIGNAL_DTYPE", raising=False)
        runner = BasecallRunner(
            config, params, chunk_size=2000, batch_size=4, decoder="viterbi"
        )
        buf = runner.make_input_buffer()
        assert buf.dtype == (np.int8 if env else np.float16)
        rng = np.random.RandomState(0)
        for i in range(4):
            runner.accept_chunk(buf, i, rng.randn(2000).astype(np.float32))
        return [c.sequence for c in runner.call_chunks(buf, 4)]

    ref = calls(False)
    got = calls(True)
    assert sum(len(s) for s in ref) > 0
    # identical or near-identical calls (tiny quantisation noise can move
    # single near-tie bases)
    from dorado_tpu.native import align

    for a, b in zip(ref, got):
        dist = align(a, b).distance if b else len(a)
        assert dist <= max(2, 0.02 * len(a)), (a[:40], b[:40])
