"""Meters — re-design of `/root/reference/yolox/utils/metric.py`.

Windowed AverageMeter + MeterBuffer used by the trainer's logging, plus
host/device memory gauges. The meter keeps a plain-float ring window
(no numpy churn per update) with running totals for the global average.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict, deque

__all__ = [
    "AverageMeter",
    "MeterBuffer",
    "get_total_and_free_memory_mb",
    "mem_usage",
    "device_mem_usage",
]


class AverageMeter:
    """Track a series of values; report windowed median/avg + global avg."""

    def __init__(self, window_size=50):
        self._window = deque(maxlen=window_size)
        self._sum_all = 0.0
        self._n_all = 0

    def update(self, value):
        value = float(value)
        self._window.append(value)
        self._sum_all += value
        self._n_all += 1

    def reset(self):
        self._window.clear()
        self._sum_all = 0.0
        self._n_all = 0

    def clear(self):
        self._window.clear()

    @property
    def latest(self):
        return self._window[-1] if self._window else None

    @property
    def avg(self):
        if not self._window:
            return 0.0
        return sum(self._window) / len(self._window)

    @property
    def median(self):
        if not self._window:
            return 0.0
        vals = sorted(self._window)
        mid = len(vals) // 2
        if len(vals) % 2:
            return vals[mid]
        return 0.5 * (vals[mid - 1] + vals[mid])

    @property
    def global_avg(self):
        return self._sum_all / max(self._n_all, 1e-5)

    @property
    def total(self):
        return self._sum_all


class MeterBuffer(defaultdict):
    """Name -> AverageMeter map with bulk update/reset helpers."""

    def __init__(self, window_size=20):
        super().__init__(
            functools.partial(AverageMeter, window_size=window_size))

    def update(self, values=None, **kwargs):
        merged = dict(values or {})
        merged.update(kwargs)
        for name, value in merged.items():
            if hasattr(value, "item"):   # device scalar / 0-d array
                value = value.item()
            self[name].update(value)

    def get_filtered_meter(self, filter_key="time"):
        return {name: meter for name, meter in self.items()
                if filter_key in name}

    def reset(self):
        for meter in self.values():
            meter.reset()

    def clear_meters(self):
        for meter in self.values():
            meter.clear()


def get_total_and_free_memory_mb():
    import psutil

    vm = psutil.virtual_memory()
    return vm.total / 1024 ** 2, vm.available / 1024 ** 2


def mem_usage():
    """Host RSS in MB."""
    import psutil

    return psutil.Process().memory_info().rss / 1024 ** 2


def device_mem_usage():
    """Allocated bytes on the default JAX device in MB (0 if unsupported)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return (stats or {}).get("bytes_in_use", 0) / 1024 ** 2
    except Exception:
        return 0.0


class Timer:
    """Wall-clock timer (the reference's CUDA-synchronized timing maps to
    fetching a device scalar before reading the clock)."""

    def __init__(self):
        self.start = time.perf_counter()

    def since_start(self):
        return time.perf_counter() - self.start
