"""TPU device health monitoring.

The TPU-native analogue of the reference's NVML poller
(dorado/torch_utils/include/torch_utils/gpu_monitor.h DeviceStatusInfo +
gpu_monitor.cpp): where the reference samples temperature / power /
throttling via NVML, a TPU runtime exposes per-device HBM accounting
through `jax.Device.memory_stats()` and link health is observable as
dispatch latency, so the monitor tracks those. Snapshots plug into the
StatsSampler (`device.` columns in --dump_stats_file) and the crash
handler dumps a final snapshot.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class DeviceStatusInfo:
    """Mirror of gpu_monitor.h DeviceStatusInfo for a TPU device: every
    field optional with an error string, populated best-effort."""

    device_index: int = 0
    device_kind: str = ""
    platform: str = ""
    bytes_in_use: int | None = None
    bytes_limit: int | None = None
    peak_bytes_in_use: int | None = None
    bytes_reserved: int | None = None
    num_allocs: int | None = None
    memory_error: str = ""
    # round-trip latency of a trivial dispatch (tunnelled links degrade
    # to seconds; locally-attached devices sit at ~1 ms)
    probe_latency_s: float | None = None
    probe_error: str = ""
    errors: list[str] = field(default_factory=list)

    @property
    def hbm_utilization(self) -> float | None:
        if self.bytes_in_use is None or not self.bytes_limit:
            return None
        return self.bytes_in_use / self.bytes_limit


class DeviceMonitor:
    """Samples device health; cheap enough for the 100 ms stats tick
    (memory_stats is a local runtime call; the latency probe is opt-in
    per call because it costs a device round trip)."""

    def __init__(self, device=None):
        self._device = device
        self._last_probe: float | None = None

    def _dev(self):
        if self._device is None:
            import jax

            self._device = jax.local_devices()[0]
        return self._device

    def status(self, probe: bool = False) -> DeviceStatusInfo:
        info = DeviceStatusInfo()
        try:
            dev = self._dev()
            info.device_index = dev.id
            info.device_kind = dev.device_kind
            info.platform = dev.platform
        except Exception as e:  # no devices at all
            info.errors.append(f"device: {e}")
            return info
        try:
            stats = dev.memory_stats() or {}
            info.bytes_in_use = stats.get("bytes_in_use")
            info.bytes_limit = stats.get("bytes_limit")
            info.peak_bytes_in_use = stats.get("peak_bytes_in_use")
            info.bytes_reserved = stats.get("bytes_reserved")
            info.num_allocs = stats.get("num_allocs")
        except Exception as e:
            info.memory_error = str(e)
        if probe:
            try:
                info.probe_latency_s = self.probe_latency()
            except Exception as e:
                info.probe_error = str(e)
        else:
            info.probe_latency_s = self._last_probe
        return info

    def probe_latency(self) -> float:
        """One trivial dispatch + fetch; the tunnel-degradation detector."""
        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        x = jnp.zeros((8,), jnp.float32) + 1.0
        float(np.asarray(x[0]))
        self._last_probe = time.perf_counter() - t0
        return self._last_probe

    def sample_stats(self) -> dict:
        """StatsSampler provider: numeric columns only."""
        info = self.status()
        row = {}
        if info.bytes_in_use is not None:
            row["hbm_bytes_in_use"] = info.bytes_in_use
        if info.peak_bytes_in_use is not None:
            row["hbm_peak_bytes"] = info.peak_bytes_in_use
        if info.bytes_limit:
            row["hbm_bytes_limit"] = info.bytes_limit
            if info.bytes_in_use is not None:
                row["hbm_utilization"] = info.bytes_in_use / info.bytes_limit
        if info.probe_latency_s is not None:
            row["probe_latency_ms"] = info.probe_latency_s * 1e3
        return row

    def health_warnings(
        self,
        hbm_threshold: float = 0.95,
        latency_threshold_s: float = 5.0,
    ) -> list[str]:
        """Human-readable warnings, logged like the reference's throttling/
        temperature notices."""
        info = self.status()
        out = []
        util = info.hbm_utilization
        if util is not None and util > hbm_threshold:
            out.append(
                f"device {info.device_index} HBM nearly full: "
                f"{info.bytes_in_use / 2**30:.2f} / "
                f"{info.bytes_limit / 2**30:.2f} GiB ({util:.0%})"
            )
        if info.probe_latency_s is not None and info.probe_latency_s > latency_threshold_s:
            out.append(
                f"device {info.device_index} dispatch latency degraded: "
                f"{info.probe_latency_s:.1f}s round trip"
            )
        return out


def describe_devices() -> list[str]:
    """One line per visible device (gpu_monitor.cpp get_devices_status_info
    role) for crash reports and -v startup logging."""
    try:
        import jax

        devices = jax.local_devices()
    except Exception as e:
        return [f"no accelerator devices: {e}"]
    lines = []
    for d in devices:
        mon = DeviceMonitor(d)
        info = mon.status()
        mem = ""
        if info.bytes_in_use is not None and info.bytes_limit:
            mem = (
                f" hbm={info.bytes_in_use / 2**30:.2f}/"
                f"{info.bytes_limit / 2**30:.2f}GiB"
            )
        lines.append(f"device {d.id}: {d.device_kind} [{d.platform}]{mem}")
    return lines
