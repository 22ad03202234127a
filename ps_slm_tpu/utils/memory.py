"""Memory tracing: device HBM stats + host RSS.

Equivalent of the reference ``MemoryTrace`` context manager
(``Multitask/utils/memory_utils.py:13-62``, logged per epoch at
``deepspeed_utils.py:358-365``) built on ``device.memory_stats()`` and
psutil instead of torch.cuda counters.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax


def device_memory_stats() -> Dict[str, float]:
    """Bytes-in-use / peak per device, in GB (0 when unsupported)."""
    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[f"device{i}_gb"] = stats.get("bytes_in_use", 0) / 2 ** 30
        out[f"device{i}_peak_gb"] = stats.get("peak_bytes_in_use", 0) / 2 ** 30
    return out


def host_rss_gb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 2 ** 30
    except ImportError:
        return 0.0


class MemoryTrace(contextlib.AbstractContextManager):
    """Context manager reporting peak device + host memory."""

    def __enter__(self):
        self.begin = device_memory_stats()
        self.begin_rss = host_rss_gb()
        return self

    def __exit__(self, *exc):
        end = device_memory_stats()
        self.peak_gb = max(
            (v for k, v in end.items() if k.endswith("peak_gb")), default=0.0
        )
        self.used_gb = max(
            (v for k, v in end.items() if k.endswith("_gb")
             and not k.endswith("peak_gb")),
            default=0.0,
        )
        self.cpu_rss_gb = host_rss_gb()
        return False

    def report(self) -> str:
        return (
            f"device used {self.used_gb:.2f} GB, peak {self.peak_gb:.2f} GB, "
            f"host RSS {self.cpu_rss_gb:.2f} GB"
        )
