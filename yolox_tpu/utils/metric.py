"""Meters — re-design of `/root/reference/yolox/utils/metric.py`.

Windowed AverageMeter + MeterBuffer used by the trainer's logging, plus
host/device memory gauges.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict, deque

import numpy as np

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
        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        self._deque.append(value)
        self._count += 1
        self._total += value

    @property
    def median(self):
        return np.median(np.array(list(self._deque))) if self._deque else 0.0

    @property
    def avg(self):
        return np.mean(np.array(list(self._deque))) if self._deque else 0.0

    @property
    def global_avg(self):
        return self._total / max(self._count, 1e-5)

    @property
    def latest(self):
        return self._deque[-1] if self._deque else None

    @property
    def total(self):
        return self._total

    def reset(self):
        self._deque.clear()
        self._total = 0.0
        self._count = 0

    def clear(self):
        self._deque.clear()


class MeterBuffer(defaultdict):
    """defaultdict of AverageMeters."""

    def __init__(self, window_size=20):
        super().__init__(functools.partial(AverageMeter,
                                           window_size=window_size))

    def reset(self):
        for v in self.values():
            v.reset()

    def get_filtered_meter(self, filter_key="time"):
        return {k: v for k, v in self.items() if filter_key in k}

    def update(self, values=None, **kwargs):
        if values is None:
            values = {}
        values.update(kwargs)
        for k, v in values.items():
            if hasattr(v, "item"):
                v = float(np.asarray(v))
            self[k].update(v)

    def clear_meters(self):
        for v in self.values():
            v.clear()


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
