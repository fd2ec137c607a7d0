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


class ThreadPoolMonitor:
    """Gauges over a cache's worker pool, published under the
    reference's ``<group>-thread-pool-metrics`` JMX groups
    (``metrics/ThreadPoolMonitor.java:58-93``; attribute names from
    ``docs/metrics.rst:150-162``). The reference monitors a
    ForkJoinPool; the Python pools are ThreadPoolExecutors, so the
    ForkJoin-only gauges (running threads not blocked on joins, steal
    count) report 0 — registered-but-idle, like an FJ pool that never
    forks."""

    def __init__(self, group: str, pool) -> None:
        self.group = group
        self.pool = pool  # concurrent.futures.ThreadPoolExecutor

    def snapshot(self) -> dict[str, float]:
        # _threads is a live set the executor mutates while spawning;
        # snapshot it with a bounded retry instead of crashing a metrics
        # read on "set changed size during iteration"
        threads: tuple = ()
        for _ in range(3):
            try:
                threads = tuple(getattr(self.pool, "_threads", ()) or ())
                break
            except RuntimeError:
                continue
        queue = getattr(self.pool, "_work_queue", None)
        queued = queue.qsize() if queue is not None else 0
        alive = sum(1 for t in threads if t.is_alive())
        return {
            f"{self.group}.active-thread-count-total": alive,
            f"{self.group}.parallelism-total": getattr(
                self.pool, "_max_workers", 0
            ),
            f"{self.group}.pool-size-total": len(threads),
            f"{self.group}.queued-task-count-total": queued,
            f"{self.group}.running-thread-count-total": 0,
            f"{self.group}.steal-task-count-total": 0,
        }


class _SampledRate:
    """Kafka-metrics style windowed rate (org.apache.kafka.common.
    metrics.stats.Rate over SampledStat): ``num_samples`` rolling
    windows of ``window_s`` seconds; the measured rate is the sum of
    non-expired sample values over the elapsed window span, floored at
    (num_samples - 1) full windows so a fresh sensor does not
    over-report. This is what the reference's ``*-rate`` attributes
    actually measure (vs. a since-start average), configured by
    ``metrics.num.samples`` / ``metrics.sample.window.ms``
    (``RemoteStorageManagerConfig.java:95-99,205-215``)."""

    __slots__ = ("num_samples", "window_s", "samples")

    def __init__(self, num_samples: int, window_s: float):
        self.num_samples = num_samples
        self.window_s = window_s
        self.samples: list[list[float]] = []  # [start_ts, value]

    def record(self, value: float, now: float) -> None:
        if not self.samples or now - self.samples[-1][0] >= self.window_s:
            self.samples.append([now, 0.0])
            if len(self.samples) > self.num_samples:
                del self.samples[0]
        self.samples[-1][1] += value

    def measure(self, now: float) -> float:
        live = [
            s for s in self.samples
            if now - s[0] < self.num_samples * self.window_s
        ]
        if not live:
            return 0.0
        total = sum(v for _, v in live)
        elapsed = max(
            now - live[0][0], (self.num_samples - 1) * self.window_s
        )
        return total / elapsed if elapsed > 0 else 0.0


class Metrics:
    def __init__(
        self,
        clock=None,
        num_samples: int = 2,
        sample_window_seconds: float = 30.0,
        recording_level: str = "INFO",
    ) -> None:
        if recording_level not in ("INFO", "DEBUG", "TRACE"):
            raise ValueError(
                "recording level must be INFO, DEBUG or TRACE, "
                f"got {recording_level!r}"
            )
        self._lock = threading.Lock()
        self._counters: dict[str, int] = defaultdict(int)
        self._timers: dict[str, float] = defaultdict(float)
        self._timer_max: dict[str, float] = defaultdict(float)
        self._clock = clock or time.monotonic
        self._created = self._clock()
        self._pool_monitors: list[ThreadPoolMonitor] = []
        self.num_samples = num_samples
        self.sample_window_seconds = sample_window_seconds
        self.recording_level = recording_level
        self._rates: dict[str, _SampledRate] = {}

    def register_pool(self, group: str, pool) -> None:
        """Attach a worker pool's gauges to ``reference_snapshot()``
        under ``<group>-thread-pool-metrics``."""
        self._pool_monitors.append(
            ThreadPoolMonitor(f"{group}-thread-pool-metrics", pool)
        )

    _LEVELS = {"INFO": 0, "DEBUG": 1, "TRACE": 2}

    def _records_at(self, level: str) -> bool:
        """Kafka MetricConfig semantics: a sensor records only when its
        level is at or below the registry's recording level (all the
        engine's built-in sensors are INFO; DEBUG/TRACE is for
        fine-grained opt-in sensors)."""
        return self._LEVELS[level] <= self._LEVELS[self.recording_level]

    def inc(
        self, name: str, value: int = 1, level: str = "INFO",
        **tags: str | int,
    ) -> None:
        if not self._records_at(level):
            return
        with self._lock:
            now = self._clock()
            key = self._key(name, tags)
            self._counters[key] += value
            for k in ({key, name} if tags else {key}):
                rate = self._rates.get(k)
                if rate is None:
                    rate = self._rates[k] = _SampledRate(
                        self.num_samples, self.sample_window_seconds
                    )
                # the UNTAGGED base sampler aggregates all tag variants
                # into ONE sensor so the JMX-group rate is a single
                # window, not a sum of per-tag windows with independent
                # elapsed floors (which over-reports on skewed activity)
                rate.record(value, now)

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
                if elapsed > self._timer_max[key]:
                    self._timer_max[key] = elapsed

    @staticmethod
    def _key(name: str, tags: dict) -> str:
        if not tags:
            return name
        suffix = ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
        return f"{name}[{suffix}]"

    def snapshot(self, derived: bool = False) -> dict[str, float]:
        """Raw counters/timers; with ``derived=True`` also the
        reference's Kafka-metrics derivations (`metrics/Metrics.java:
        79-262` registers Rate alongside every CumulativeSum and
        Avg/Max alongside every cumulative timer — `docs/metrics.rst`
        ``*-rate``/``*-time-avg``/``*-time-max``): per-timer ``.avg`` and
        ``.max``, per-counter ``.rate`` measured as the Kafka-sensor
        WINDOWED rate (num_samples x sample_window; idle sensors decay
        to 0 — NOT a since-start average). Existing key names are
        unchanged."""
        with self._lock:
            out: dict[str, float] = dict(self._counters)
            out.update(self._timers)
            if not derived:
                return out
            now = self._clock()
            for key, seconds in self._timers.items():
                base = key[: -len(".seconds")]
                count = self._counters.get(base + ".count", 0)
                if count:
                    out[base + ".avg"] = seconds / count
                out[base + ".max"] = self._timer_max[base]
            for key in self._counters:
                if not key.endswith(".count"):
                    r = self._rates.get(key)
                    out[key + ".rate"] = r.measure(now) if r else 0.0
            return out

    def windowed_rate(self, name: str, **tags) -> float:
        """The Kafka-sensor rate of a counter: per-second over the
        configured sample windows, NOT since-registry-start."""
        with self._lock:
            rate = self._rates.get(self._key(name, tags))
            return rate.measure(self._clock()) if rate else 0.0

    # -- metrics.rst name parity ----------------------------------------------

    def _agg_counter(self, base: str) -> float:
        """Sum a counter across all tag combinations (untagged JMX group)."""
        total = 0.0
        for key, value in self._counters.items():
            name = key.split("[", 1)[0]
            if name == base:
                total += value
        return total

    def _agg_timer(self, base: str) -> tuple[float, float, float]:
        """(seconds, count, max) for a timer across all tag combinations."""
        seconds = count = maxv = 0.0
        for key, value in self._timers.items():
            stem = key[: -len(".seconds")]
            if stem.split("[", 1)[0] == base:
                seconds += value
                count += self._counters.get(stem + ".count", 0)
                maxv = max(maxv, self._timer_max[stem])
        return seconds, count, maxv

    def reference_snapshot(self) -> dict[str, float]:
        """The engine's counters under the reference's published JMX
        attribute names (``docs/metrics.rst``, generated from the
        ``MetricRegistry`` classes): the untagged
        ``remote-storage-manager-metrics`` group plus the three cache
        groups and the per-backend ``*-client-metrics`` groups
        (``storage/s3/.../MetricRegistry.java:24-84``). Names not yet
        fired report 0, mirroring a registered-but-idle Kafka sensor.
        Cache/backend groups are namespaced ``<group>.<attribute>``."""
        with self._lock:
            now = self._clock()

            def rate(base: str) -> float:
                # the untagged aggregate sampler IS the group's sensor
                r = self._rates.get(base)
                return r.measure(now) if r else 0.0

            out: dict[str, float] = {}
            # remote-storage-manager-metrics (metrics.rst:16-30)
            for ref, internal in [
                ("object-upload-bytes", "upload.bytes"),
                ("object-upload", "upload.requests"),
                ("segment-delete", "segment.delete"),
                ("segment-delete-bytes", "segment.delete.bytes"),
                ("segment-delete-errors", "segment.delete.errors"),
                ("segment-copy-errors", "segment.copy.failures"),
                ("segment-fetch-requested-bytes", "fetch.requested.bytes"),
            ]:
                out[ref + "-total"] = self._agg_counter(internal)
                if ref not in ("segment-delete-bytes",):  # rst: no rate form
                    out[ref + "-rate"] = rate(internal)
            for ref, internal in [
                ("segment-copy-time", "segment.copy"),
                ("segment-delete-time", "segment.delete.time"),
            ]:
                seconds, count, maxv = self._agg_timer(internal)
                out[ref + "-avg"] = seconds / count if count else 0.0
                out[ref + "-max"] = maxv
            # cache groups (metrics.rst:121-183): cache-hits/misses-total
            for group, internal in [
                ("chunk-cache-metrics", "chunk_cache"),
                ("segment-indexes-cache-metrics", "index_cache"),
                ("segment-manifest-cache-metrics", "manifest_cache"),
            ]:
                out[f"{group}.cache-hits-total"] = self._agg_counter(
                    internal + ".hits"
                )
                out[f"{group}.cache-misses-total"] = self._agg_counter(
                    internal + ".misses"
                )
            # per-backend client groups (storage/*/MetricRegistry.java):
            # requests + time per op, tagged by backend label
            ops = [
                "get-object",
                "put-object",
                "delete-object",
                "delete-objects",
            ]
            backends = set()
            for key in list(self._counters) + list(self._timers):
                if key.startswith("storage.") and "[backend=" in key:
                    backends.add(key.split("[backend=", 1)[1].split("]")[0].split(",")[0])
            for backend in sorted(backends):
                group = f"{backend}-client-metrics"
                for op in ops:
                    req_key = self._key(
                        f"storage.{op}-requests", {"backend": backend}
                    )
                    total = self._counters.get(req_key, 0)
                    out[f"{group}.{op}-requests-total"] = total
                    op_rate = self._rates.get(req_key)
                    out[f"{group}.{op}-requests-rate"] = (
                        op_rate.measure(now) if op_rate else 0.0
                    )
                    t_stem = self._key(
                        f"storage.{op}-time", {"backend": backend}
                    )
                    seconds = self._timers.get(t_stem + ".seconds", 0.0)
                    count = self._counters.get(t_stem + ".count", 0)
                    out[f"{group}.{op}-time-avg"] = (
                        seconds / count if count else 0.0
                    )
                    out[f"{group}.{op}-time-max"] = self._timer_max.get(
                        t_stem, 0.0
                    )
            for mon in self._pool_monitors:
                out.update(mon.snapshot())
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
