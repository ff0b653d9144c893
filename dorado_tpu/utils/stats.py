"""Runtime stats sampling and progress reporting.

Parity with the reference's observability layer (dorado/utils/stats.h
StatsSampler polling named stats every 100 ms into an optional CSV via
--dump_stats_file, and cli_lib/ProgressTracker.cpp's final summary lines).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, TextIO

NamedStats = dict[str, float]
StatsProvider = Callable[[], NamedStats]


class StatsSampler:
    """Polls registered providers on a fixed period; optionally dumps rows to
    a CSV stream (stats.h:30-67 semantics)."""

    def __init__(
        self,
        providers: dict[str, StatsProvider],
        period_s: float = 0.1,
        dump_stream: TextIO | None = None,
        dump_filter: str = "",
    ):
        self._providers = providers
        self._period = period_s
        self._dump = dump_stream
        self._filter = dump_filter
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._records: list[NamedStats] = []
        self._header_written = False

    def _sample(self) -> NamedStats:
        row: NamedStats = {"elapsed_ms": (time.perf_counter() - self._t0) * 1e3}
        for prefix, provider in self._providers.items():
            try:
                for k, v in provider().items():
                    name = f"{prefix}.{k}"
                    if self._filter and self._filter not in name:
                        continue
                    row[name] = float(v)
            except Exception:
                pass
        return row

    def _loop(self) -> None:
        while not self._stop.wait(self._period):
            row = self._sample()
            self._records.append(row)
            if self._dump is not None:
                if not self._header_written:
                    self._dump.write(",".join(row.keys()) + "\n")
                    self._header_written = True
                self._dump.write(",".join(f"{v:g}" for v in row.values()) + "\n")

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._dump is not None:
            self._dump.flush()

    @property
    def records(self) -> list[NamedStats]:
        return self._records


class ProgressTracker:
    """Final-summary printing (ProgressTracker.cpp:73-77)."""

    def __init__(self, stream):
        self._stream = stream

    def summarise(self, stats, elapsed_s: float) -> None:
        p = lambda s: print(s, file=self._stream)  # noqa: E731
        p(f"> Reads basecalled: {stats.reads_called}")
        if elapsed_s > 0:
            p(f"> Basecalled @ Samples/s: {stats.samples_processed / elapsed_s:.3e}")
            p(f"> Basecalled @ Bases/s: {stats.bases_called / elapsed_s:.3e}")
            if stats.samples_incl_padding:
                incl = stats.samples_incl_padding / elapsed_s
                p(f"> Basecalled @ Samples/s incl. padding: {incl:.3e}")
        if stats.samples_incl_padding:
            pct = 100.0 * (1.0 - stats.samples_processed / stats.samples_incl_padding)
            p(f"> Padding percentage: {pct:.1f}%")
        if getattr(stats, "device_idle_s", None) is not None and elapsed_s > 0:
            p(f"> Device idle: {100.0 * stats.device_idle_s / elapsed_s:.1f}%")
        if getattr(stats, "device_fetch_s", None) is not None and elapsed_s > 0:
            # per-stage split (the reference exposes the analogous per-range
            # scopes via gpu_profiling.h): dispatch-wait = blocked enqueuing
            # the async device step; device-fetch = blocked in device_get
            # (device drain + D2H transfer); host-decode = numpy unpack;
            # host-finish = stitch/tags/write thread-seconds across workers
            p(
                "> Stage times: dispatch-wait "
                f"{stats.dispatch_wait_s:.1f}s / device-fetch "
                f"{stats.device_fetch_s:.1f}s / host-decode "
                f"{stats.host_decode_s:.1f}s / host-finish "
                f"{stats.host_finish_s:.1f} thread-s "
                f"(wall {elapsed_s:.1f}s)"
            )
