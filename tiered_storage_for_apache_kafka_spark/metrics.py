"""Engine metrics — parity with the reference's metric groups
(``docs/metrics.rst``; ``metrics/Metrics.java:79-262``): segment copy
time/bytes by object type, fetch requested bytes, deletes, cache
hit/miss/eviction. Thread-safe counters; on a cluster these surface as
Spark accumulators / StreamingQueryProgress custom metrics, locally as a
plain snapshot dict."""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, int] = defaultdict(int)
        self._timers: dict[str, float] = defaultdict(float)

    def inc(self, name: str, value: int = 1, **tags: str | int) -> None:
        with self._lock:
            self._counters[self._key(name, tags)] += value

    @contextmanager
    def time(self, name: str, **tags: str | int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - t0
            with self._lock:
                key = self._key(name, tags)
                self._timers[key + ".seconds"] += elapsed
                self._counters[key + ".count"] += 1

    @staticmethod
    def _key(name: str, tags: dict) -> str:
        if not tags:
            return name
        suffix = ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
        return f"{name}[{suffix}]"

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            out: dict[str, float] = dict(self._counters)
            out.update(self._timers)
            return out
