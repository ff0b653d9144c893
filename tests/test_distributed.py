"""Multi-process distributed backend test: two real processes, each with 2
virtual CPU devices, joined via jax.distributed — exercising
init_distributed, POD5 file sharding, the end-of-run global-stats
all-reduce, the cross-process barrier, and the per-host BAM shard merge
(parallel/distributed.py; SURVEY §2.4/§5.8 multi-host design)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys, json
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dorado_tpu.parallel.distributed import (
        all_reduce_stats, barrier, host_output_path, init_distributed,
        merge_host_bams, shard_files_for_host,
    )

    pid = int(sys.argv[1])
    coord = sys.argv[2]
    outdir = sys.argv[3]
    pi, pc = init_distributed(coord, num_processes=2, process_id=pid)
    assert (pi, pc) == (pid, 2), (pi, pc)
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    from pathlib import Path
    files = [Path(f"f{{i}}.pod5") for i in range(7)]
    mine = shard_files_for_host(files)
    assert len(mine) in (3, 4)

    # each host writes its own BAM shard
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
    out = Path(outdir) / "calls.bam"
    my_out = host_output_path(out)
    header = SamHeader()
    n_mine = 3 if pid == 0 else 2
    with open(my_out, "wb") as f:
        w = BamWriter(f, header)
        for i in range(n_mine):
            w.write(SamRecord(qname=f"h{{pid}}-r{{i}}", seq="ACGT", qual="IIII"))
        w.close()

    stats = all_reduce_stats({{"reads": float(n_mine), "bases": 4.0 * n_mine}})
    assert stats["reads"] == 5.0, stats
    assert stats["bases"] == 20.0, stats

    barrier("pre-merge")
    if pid == 0:
        appended = merge_host_bams(out, 2)
        assert appended == 2, appended
        from dorado_tpu.io.bam_reader import stream_bam
        with open(out, "rb") as f:
            _, _, records = stream_bam(f)
            names = [r.qname for r in records]
        assert names == ["h0-r0", "h0-r1", "h0-r2", "h1-r0", "h1-r1"], names
    barrier("post-merge")
    print(f"WORKER_OK {{pid}}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO)))
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": str(REPO),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    assert any("WORKER_OK 0" in out for _, out, _ in outs)
    assert any("WORKER_OK 1" in out for _, out, _ in outs)


@pytest.mark.timeout(300)
def test_scaling_overhead_under_budget():
    """Orchestration overhead (init + sync + merge) stays under the 15%
    budget at P=2 on the CPU mesh for a ~10 s compute workload — the CI
    guard for docs/SCALING.md (full table: scaling_bench main)."""
    from dorado_tpu.parallel.scaling_bench import run_scaling

    rows = run_scaling(process_counts=(2,), batches=4000)
    assert rows[0]["orchestration_overhead_pct"] < 15.0, rows[0]


class TestMergeRawSplice:
    """merge_host_bams fast path: raw BGZF block splice (no record
    re-encode) for shards written by this package's BamWriter."""

    def _write_shard(self, path, names, seq="ACGTACGT"):
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord

        with open(path, "wb") as f:
            w = BamWriter(f, SamHeader())
            for q in names:
                w.write(SamRecord(qname=q, seq=seq, qual="I" * len(seq)))
            w.close()

    def test_fast_path_triggers_and_records_identical(self, tmp_path):
        from dorado_tpu.io.bam_reader import stream_bam
        from dorado_tpu.parallel.distributed import (
            _bam_header_block_span,
            host_output_path,
            merge_host_bams,
        )

        out = tmp_path / "calls.bam"
        self._write_shard(out, [f"h0-r{i}" for i in range(4)])
        for pid, n in [(1, 3), (2, 5)]:
            self._write_shard(
                host_output_path(out, pid), [f"h{pid}-r{i}" for i in range(n)]
            )
        # our writer flushes after the header, so the splice precondition
        # holds for every file
        assert _bam_header_block_span(out) is not None

        appended = merge_host_bams(out, 3)
        assert appended == 8
        with open(out, "rb") as f:
            _, _, records = stream_bam(f)
            got = [(r.qname, r.seq, r.qual) for r in records]
        expect = [(f"h0-r{i}", "ACGTACGT", "IIIIIIII") for i in range(4)]
        expect += [(f"h1-r{i}", "ACGTACGT", "IIIIIIII") for i in range(3)]
        expect += [(f"h2-r{i}", "ACGTACGT", "IIIIIIII") for i in range(5)]
        assert got == expect
        assert not host_output_path(out, 1).exists()

    def test_spliced_record_bytes_identical_to_shard_bytes(self, tmp_path):
        """The spliced output must contain every shard's record BLOCKS
        verbatim (the whole point: no re-encode)."""
        from dorado_tpu.parallel.distributed import (
            _bam_header_block_span,
            host_output_path,
            merge_host_bams,
        )
        from dorado_tpu.io.bgzf import BGZF_EOF

        out = tmp_path / "calls.bam"
        self._write_shard(out, ["a", "b"])
        shard = host_output_path(out, 1)
        self._write_shard(shard, ["c", "d", "e"])
        span = _bam_header_block_span(shard)
        shard_record_bytes = shard.read_bytes()[span:-len(BGZF_EOF)]
        host0_bytes = out.read_bytes()[: -len(BGZF_EOF)]

        merge_host_bams(out, 2)
        merged = out.read_bytes()
        assert merged == host0_bytes + shard_record_bytes + BGZF_EOF

    def test_truncated_shard_falls_back_to_reencode(self, tmp_path):
        """A shard missing its BGZF EOF (crashed writer) must NOT be raw-
        spliced — the splice would silently cut its last 28 record bytes.
        The merge falls back to streaming re-encode and keeps every intact
        record."""
        from dorado_tpu.io.bam_reader import stream_bam
        from dorado_tpu.io.bgzf import BGZF_EOF
        from dorado_tpu.parallel.distributed import (
            host_output_path,
            merge_host_bams,
        )

        out = tmp_path / "calls.bam"
        self._write_shard(out, ["a", "b"])
        shard = host_output_path(out, 1)
        self._write_shard(shard, ["c", "d"])
        shard.write_bytes(shard.read_bytes()[: -len(BGZF_EOF)])  # crash trim

        appended = merge_host_bams(out, 2)
        assert appended == 2
        with open(out, "rb") as f:
            _, _, records = stream_bam(f)
            assert [r.qname for r in records] == ["a", "b", "c", "d"]

    def test_header_mismatch_falls_back_to_reencode(self, tmp_path):
        """Shards whose header differs from host 0's (reference ids are
        positional in BAM records) must be re-encoded against host 0's
        header, not spliced."""
        from dorado_tpu.io.bam_reader import stream_bam
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
        from dorado_tpu.parallel.distributed import (
            host_output_path,
            merge_host_bams,
        )

        out = tmp_path / "calls.bam"
        self._write_shard(out, ["a"])
        shard = host_output_path(out, 1)
        hdr = SamHeader()
        hdr.programs.append({"ID": "other", "PN": "x"})  # different header
        with open(shard, "wb") as f:
            w = BamWriter(f, hdr)
            w.write(SamRecord(qname="c", seq="ACGT", qual="IIII"))
            w.close()

        appended = merge_host_bams(out, 2)
        assert appended == 1
        with open(out, "rb") as f:
            _, _, records = stream_bam(f)
            assert [r.qname for r in records] == ["a", "c"]

    def test_large_merge_runs_at_io_speed(self, tmp_path):
        """~40 MB of shards: the splice must not scale with record decode
        cost. Guarded loosely (seconds, not ms) to stay CI-safe; the
        re-encode path on the same data takes >10x longer."""
        import time

        from dorado_tpu.io.bam_reader import stream_bam
        from dorado_tpu.parallel.distributed import (
            host_output_path,
            merge_host_bams,
        )

        out = tmp_path / "calls.bam"
        seq = "ACGT" * 2500  # 10 kb reads
        self._write_shard(out, [f"h0-r{i}" for i in range(500)], seq=seq)
        for pid in (1, 2):
            self._write_shard(
                host_output_path(out, pid),
                [f"h{pid}-r{i}" for i in range(1500)],
                seq=seq,
            )
        t0 = time.perf_counter()
        appended = merge_host_bams(out, 3)
        dt = time.perf_counter() - t0
        assert appended == 3000
        assert dt < 5.0, f"raw splice took {dt:.1f}s — re-encode fallback?"
        with open(out, "rb") as f:
            _, _, records = stream_bam(f)
            assert sum(1 for _ in records) == 3500
