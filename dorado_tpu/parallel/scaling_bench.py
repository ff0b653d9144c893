"""Multi-host scaling benchmark over the virtual CPU mesh.

Measures what the BASELINE north star (>= 85% multi-host scaling
efficiency) depends on from the framework side: the per-host orchestration
cost that `parallel/distributed.py` adds around the (perfectly parallel)
per-host basecall work, plus the end-of-run shard merge rate.

Design: chunks are data-parallel across hosts with NO hot-loop
collectives (each host feeds its own POD5 shard through its own device
and writes its own BAM shard — SURVEY §2.4), so multi-host efficiency is

    efficiency = t_compute / (t_compute + t_init + t_sync + t_merge/P)

measured here with P in {1, 2, 4} real `jax.distributed` processes on the
CPU backend. Each worker times its phases separately:

- t_init: jax.distributed connect + device enumeration
- t_compute: a fixed per-host dispatch loop (the proxy for basecall work;
  identical per process, so wall-clock inflation under contention shows
  up here, not in the orchestration terms)
- t_sync: the end-of-run stats all-reduce + the two barriers around merge

and host 0 additionally times merge_host_bams over the real shard files.
The merge is also benchmarked standalone on a multi-GB incompressible
shard set to verify it runs at IO speed (raw BGZF block splice — no
record re-encode; parallel/distributed.py merge_host_bams fast path).

Run: python -m dorado_tpu.parallel.scaling_bench [--merge-gb N]
Results table: docs/SCALING.md.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent

WORKER = textwrap.dedent(
    """
    import json, sys, time
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dorado_tpu.parallel.distributed import (
        all_reduce_stats, barrier, host_output_path, init_distributed,
        merge_host_bams, shard_files_for_host,
    )

    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], sys.argv[4]
    batches, rows = int(sys.argv[5]), int(sys.argv[6])

    t0 = time.perf_counter()
    if nproc > 1:
        init_distributed(coord, num_processes=nproc, process_id=pid)
    t_init = time.perf_counter() - t0

    # fixed per-host compute: a jitted dispatch loop standing in for the
    # basecall engine (identical per process; chunk batches are
    # data-parallel with no cross-host collectives in the hot loop)
    chunk = 1000
    w = jnp.asarray(np.random.RandomState(0).randn(chunk, chunk), jnp.float32)

    @jax.jit
    def step(x):
        return jnp.tanh(x @ w).sum(axis=1)

    x = jnp.asarray(np.random.RandomState(pid).randn(rows, chunk), jnp.float32)
    np.asarray(step(x)[:1])  # compile
    t0 = time.perf_counter()
    for _ in range(batches):
        out = step(x)
    np.asarray(out[:1])
    t_compute = time.perf_counter() - t0
    samples = batches * rows * chunk

    # per-host BAM shard (incompressible payload, fixed size per host)
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
    from pathlib import Path
    rng = np.random.RandomState(pid)
    out_path = Path(outdir) / "calls.bam"
    my_out = host_output_path(out_path) if nproc > 1 else out_path
    with open(my_out, "wb") as f:
        wtr = BamWriter(f, SamHeader())
        for i in range(40):
            seq = "".join(np.frombuffer(b"ACGT", np.uint8)[
                rng.randint(0, 4, 5000)].view("S1").astype(str))
            qual = "".join(chr(33 + int(q)) for q in rng.randint(0, 60, 5000))
            wtr.write(SamRecord(qname=f"h{{pid}}-r{{i}}", seq=seq, qual=qual))
        wtr.close()

    t_sync = 0.0
    t_merge = 0.0
    if nproc > 1:
        t0 = time.perf_counter()
        stats = all_reduce_stats({{"samples": float(samples)}})
        assert stats["samples"] == float(samples) * nproc
        barrier("pre-merge")
        t_sync += time.perf_counter() - t0
        if pid == 0:
            t0 = time.perf_counter()
            merge_host_bams(out_path, nproc)
            t_merge = time.perf_counter() - t0
        t0 = time.perf_counter()
        barrier("post-merge")
        t_sync += time.perf_counter() - t0

    print("RESULT " + json.dumps(dict(
        pid=pid, t_init=t_init, t_compute=t_compute, t_sync=t_sync,
        t_merge=t_merge, samples=samples)))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_scaling(
    process_counts=(1, 2, 4), batches: int = 8000, rows: int = 256
) -> list[dict]:
    """One row per process count: per-host phase times + efficiency."""
    rows_out = []
    for nproc in process_counts:
        with tempfile.TemporaryDirectory(prefix="scaling_") as tmp:
            worker = Path(tmp) / "worker.py"
            worker.write_text(WORKER.format(repo=str(REPO)))
            coord = f"127.0.0.1:{_free_port()}"
            env = {
                **os.environ,
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
                "PYTHONPATH": str(REPO),
            }
            t_wall = time.perf_counter()
            procs = [
                subprocess.Popen(
                    [
                        sys.executable, str(worker), str(pid), str(nproc),
                        coord, tmp, str(batches), str(rows),
                    ],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                    env=env,
                )
                for pid in range(nproc)
            ]
            results = []
            for p in procs:
                out, err = p.communicate(timeout=600)
                if p.returncode != 0:
                    raise RuntimeError(err[-3000:])
                for line in out.splitlines():
                    if line.startswith("RESULT "):
                        results.append(json.loads(line[7:]))
            t_wall = time.perf_counter() - t_wall
        assert len(results) == nproc
        t_compute = max(r["t_compute"] for r in results)
        t_init = max(r["t_init"] for r in results)
        t_sync = max(r["t_sync"] for r in results)
        t_merge = max(r["t_merge"] for r in results)
        overhead = t_init + t_sync + t_merge
        rows_out.append(
            {
                "processes": nproc,
                "t_compute_s": round(t_compute, 3),
                "t_init_s": round(t_init, 3),
                "t_sync_s": round(t_sync, 3),
                "t_merge_s": round(t_merge, 3),
                "orchestration_overhead_pct": round(
                    100.0 * overhead / (overhead + t_compute), 2
                ),
                "per_host_samples_per_s": round(
                    results[0]["samples"] / t_compute, 1
                ),
                "wall_s": round(t_wall, 2),
            }
        )
    return rows_out


def run_merge_bench(total_gb: float = 2.0, shards: int = 3) -> dict:
    """Raw-splice merge rate on a multi-GB incompressible shard set vs the
    filesystem's own copy rate (the splice's upper bound)."""
    import numpy as np

    from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
    from dorado_tpu.parallel.distributed import host_output_path, merge_host_bams

    per_shard = total_gb * (1 << 30) / shards
    with tempfile.TemporaryDirectory(prefix="merge_bench_") as tmp:
        out = Path(tmp) / "calls.bam"
        rng = np.random.RandomState(0)
        read_len = 100_000
        n_reads = max(1, int(per_shard / (read_len * 1.3)))
        lut = np.frombuffer(b"ACGT", np.uint8)

        def write_shard(path):
            with open(path, "wb") as f:
                w = BamWriter(f, SamHeader())
                for i in range(n_reads):
                    seq = lut[rng.randint(0, 4, read_len)].tobytes().decode()
                    qual = (rng.randint(33, 93, read_len).astype(np.uint8)
                            .tobytes().decode())
                    w.write(SamRecord(qname=f"r{i}", seq=seq, qual=qual))
                w.close()

        write_shard(out)
        for pid in range(1, shards):
            write_shard(host_output_path(out, pid))
        shard_bytes = sum(
            host_output_path(out, p).stat().st_size for p in range(1, shards)
        )
        # filesystem copy rate as the splice's speed-of-light
        src = host_output_path(out, 1)
        t0 = time.perf_counter()
        data = src.read_bytes()
        (Path(tmp) / "copy.bin").write_bytes(data)
        copy_rate = len(data) / (time.perf_counter() - t0)
        del data

        t0 = time.perf_counter()
        appended = merge_host_bams(out, shards)
        dt = time.perf_counter() - t0
        return {
            "shards": shards,
            "spliced_bytes": shard_bytes,
            "records": appended,
            "merge_s": round(dt, 3),
            "merge_mb_per_s": round(shard_bytes / dt / 1e6, 1),
            "fs_copy_mb_per_s": round(copy_rate / 1e6, 1),
            "vs_fs_copy": round(shard_bytes / dt / copy_rate, 2),
        }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--merge-gb", type=float, default=2.0)
    ap.add_argument("--processes", type=str, default="1,2,4")
    args = ap.parse_args()
    pcs = tuple(int(x) for x in args.processes.split(","))
    print("scaling (virtual CPU mesh):")
    for row in run_scaling(pcs):
        print(json.dumps(row))
    print("merge:")
    print(json.dumps(run_merge_bench(args.merge_gb)))


if __name__ == "__main__":
    main()
