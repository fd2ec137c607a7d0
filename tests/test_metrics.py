"""Metrics plane: counter/timer semantics and reference metric-group
parity (`docs/metrics.rst` remote-storage-manager group; `metrics/
Metrics.java:79-262`)."""

from __future__ import annotations

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentData,
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.metrics import Metrics
from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
    FileSystemStorage,
)


def test_counters_and_timers():
    m = Metrics()
    m.inc("a")
    m.inc("a", 4)
    m.inc("b", 2, topic="t", kind="x")
    with m.time("op", topic="t"):
        pass
    snap = m.snapshot()
    assert snap["a"] == 5
    assert snap["b[kind=x,topic=t]"] == 2  # tags sorted in the key
    assert snap["op[topic=t].count"] == 1
    assert snap["op[topic=t].seconds"] >= 0


def test_lifecycle_emits_reference_metric_groups(tmp_path):
    """A copy→fetch→delete lifecycle populates every metric the
    reference's remote-storage-manager group tracks: per-object-type
    upload bytes, segment copy time, fetch requested bytes, deletes."""
    mgr = TieredStorageManager(
        FileSystemStorage(str(tmp_path)), chunk_size=512,
        compression_enabled=True,
    )
    meta = SegmentMetadata("t", "tid", 0, 0, 9, "u-metrics")
    payload = b"m" * 4000
    mgr.copy_log_segment_data(
        meta,
        SegmentData(payload, {"offset": b"O" * 32, "timestamp": b"T" * 16,
                              "producerSnapshot": b"", "leaderEpoch": b""}),
    )
    b"".join(mgr.fetch_log_segment(meta, 100, 299))
    mgr.delete_log_segment_data(meta)

    snap = mgr.metrics.snapshot()
    # docs/metrics.rst attribute-name analogs, tag-structured:
    assert snap["segment.copy[topic=t].count"] == 1
    assert snap["segment.copy[topic=t].seconds"] > 0  # -time-avg/max basis
    assert snap["upload.bytes[object_type=log]"] > 0
    assert snap["upload.bytes[object_type=indexes]"] == 48
    assert snap["upload.bytes[object_type=manifest]"] > 0
    assert snap["fetch.requested.bytes[topic=t]"] == 200
    assert snap["segment.delete[topic=t]"] == 1
    # failure counter only on failure paths
    assert "segment.copy.failures" not in snap


def test_chunk_cache_stats_bridge_into_engine_metrics(tmp_path):
    """CaffeineStatsCounter parity: a manager-wired cache reports its
    hits/misses through the engine metrics plane."""
    from tiered_storage_for_apache_kafka_spark.api import (
        SegmentData,
        SegmentMetadata,
        TieredStorageManager,
    )
    from tiered_storage_for_apache_kafka_spark.fetch.cache import MemoryChunkCache
    from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
        FileSystemStorage,
    )

    cache = MemoryChunkCache()
    mgr = TieredStorageManager(
        FileSystemStorage(tmp_path), chunk_size=64, cache=cache
    )
    meta = SegmentMetadata(
        topic="t", topic_id="tid", partition=0, start_offset=0,
        end_offset=9, segment_uuid="u-metrics",
    )
    mgr.copy_log_segment_data(
        meta,
        SegmentData(b"z" * 300, {
            "offset": b"o", "timestamp": b"t",
            "producerSnapshot": b"s", "leaderEpoch": b"e",
        }),
    )
    b"".join(mgr.fetch_log_segment(meta, 0))  # cold: misses
    b"".join(mgr.fetch_log_segment(meta, 0))  # warm: hits
    snap = mgr.metrics.snapshot()
    assert snap.get("chunk_cache.misses", 0) >= 1
    assert snap.get("chunk_cache.hits", 0) >= 1
    assert snap["chunk_cache.hits"] == cache.hits
    assert snap["chunk_cache.misses"] == cache.misses


def test_derived_avg_max_rate():
    from tiered_storage_for_apache_kafka_spark.metrics import Metrics

    now = [100.0]
    m = Metrics(clock=lambda: now[0])
    m.inc("upload.bytes", 500, object_type="log")
    with m.time("segment.copy", topic="t"):
        pass
    with m.time("segment.copy", topic="t"):
        pass
    now[0] = 110.0  # 10 s elapsed
    snap = m.snapshot(derived=True)
    # existing keys unchanged
    assert snap["upload.bytes[object_type=log]"] == 500
    assert "segment.copy[topic=t].seconds" in snap
    # derivations: the rate is the Kafka-sensor WINDOWED rate — with the
    # default 2 x 30 s samples, a fresh sensor divides by the one full
    # window floor, not elapsed-since-start
    assert snap["upload.bytes[object_type=log].rate"] == 500 / 30.0
    base = "segment.copy[topic=t]"
    assert snap[base + ".avg"] == snap[base + ".seconds"] / 2
    assert snap[base + ".max"] >= snap[base + ".avg"]


# The checked-in name list mirroring docs/metrics.rst groups (generated
# from the reference's MetricRegistry classes): remote-storage-manager-
# metrics attributes (metrics.rst:16-30), the cache groups'
# hit/miss attributes (metrics.rst:121-183), and the s3-client-metrics
# request/time attributes (storage/s3/.../MetricRegistry.java:24-84).
REFERENCE_RSM_NAMES = {
    "object-upload-bytes-rate",
    "object-upload-bytes-total",
    "object-upload-rate",
    "object-upload-total",
    "segment-copy-time-avg",
    "segment-copy-time-max",
    "segment-delete-bytes-total",
    "segment-delete-errors-rate",
    "segment-delete-errors-total",
    "segment-delete-rate",
    "segment-delete-time-avg",
    "segment-delete-time-max",
    "segment-delete-total",
    "segment-fetch-requested-bytes-rate",
    "segment-fetch-requested-bytes-total",
}
REFERENCE_CACHE_NAMES = {
    f"{group}.{attr}"
    for group in (
        "chunk-cache-metrics",
        "segment-indexes-cache-metrics",
        "segment-manifest-cache-metrics",
    )
    for attr in ("cache-hits-total", "cache-misses-total")
}
REFERENCE_CLIENT_NAMES = {
    f"filesystem-client-metrics.{op}-{kind}"
    for op in ("get-object", "put-object", "delete-object", "delete-objects")
    for kind in ("requests-total", "requests-rate", "time-avg", "time-max")
}


def test_reference_snapshot_name_parity(tmp_path):
    from tiered_storage_for_apache_kafka_spark.api import (
        SegmentData,
        SegmentMetadata,
        TieredStorageManager,
    )
    from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
        FileSystemStorage,
    )
    from tiered_storage_for_apache_kafka_spark.storage.metering import (
        MeteredBackend,
    )

    mgr = TieredStorageManager(
        MeteredBackend(FileSystemStorage(tmp_path), None), chunk_size=64
    )
    mgr.backend.metrics = mgr.metrics
    meta = SegmentMetadata(
        topic="t", topic_id="tid", partition=0, start_offset=0,
        end_offset=9, segment_uuid="u-ref-names",
    )
    mgr.copy_log_segment_data(
        meta,
        SegmentData(b"z" * 300, {
            "offset": b"o", "timestamp": b"t",
            "producerSnapshot": b"s", "leaderEpoch": b"e",
        }),
    )
    b"".join(mgr.fetch_log_segment(meta, 0))
    mgr.fetch_index(meta, "offset")
    mgr.fetch_index(meta, "offset")
    mgr.delete_log_segment_data(meta)

    ref = mgr.metrics.reference_snapshot()
    missing = (
        REFERENCE_RSM_NAMES | REFERENCE_CACHE_NAMES | REFERENCE_CLIENT_NAMES
    ) - set(ref)
    assert not missing, f"missing reference metric names: {sorted(missing)}"
    # spot-check values
    assert ref["object-upload-total"] == 3  # log + indexes + manifest
    assert ref["object-upload-bytes-total"] > 300
    assert ref["segment-delete-total"] == 1
    assert ref["segment-delete-bytes-total"] == 300  # manifest was cached
    assert ref["segment-delete-time-max"] > 0
    assert ref["segment-copy-time-avg"] > 0
    assert ref["segment-indexes-cache-metrics.cache-hits-total"] == 1
    assert ref["segment-indexes-cache-metrics.cache-misses-total"] == 1
    # copy write-through seeds the manifest cache, so lookups HIT
    assert ref["segment-manifest-cache-metrics.cache-hits-total"] >= 1
    assert ref["filesystem-client-metrics.put-object-requests-total"] == 3
    assert ref["filesystem-client-metrics.delete-objects-requests-total"] == 1
    assert ref["filesystem-client-metrics.get-object-time-avg"] > 0
    assert ref["object-upload-rate"] > 0


def test_metered_backend_delete_single_key(tmp_path):
    from tiered_storage_for_apache_kafka_spark.metrics import Metrics
    from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
        FileSystemStorage,
    )
    from tiered_storage_for_apache_kafka_spark.storage.metering import (
        MeteredBackend,
    )

    m = Metrics()
    b = MeteredBackend(FileSystemStorage(tmp_path), m)
    b.upload("k1", b"abc")
    b.delete("k1")
    snap = m.snapshot()
    assert snap["storage.delete-object-requests[backend=filesystem]"] == 1
    assert snap["storage.put-object-requests[backend=filesystem]"] == 1


def test_thread_pool_monitor_groups(tmp_path):
    from tiered_storage_for_apache_kafka_spark.api import TieredStorageManager
    from tiered_storage_for_apache_kafka_spark.fetch.cache import MemoryChunkCache
    from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
        FileSystemStorage,
    )

    mgr = TieredStorageManager(
        FileSystemStorage(tmp_path), cache=MemoryChunkCache()
    )
    ref = mgr.metrics.reference_snapshot()
    for group in (
        "chunk-cache-thread-pool-metrics",
        "segment-indexes-cache-thread-pool-metrics",
    ):
        for attr in (
            "active-thread-count-total",
            "parallelism-total",
            "pool-size-total",
            "queued-task-count-total",
            "running-thread-count-total",
            "steal-task-count-total",
        ):
            assert f"{group}.{attr}" in ref, f"{group}.{attr}"
    assert ref["chunk-cache-thread-pool-metrics.parallelism-total"] == 4


def test_windowed_rate_semantics():
    """Kafka Rate parity: sampled windows expire — a burst an hour ago
    contributes ZERO to the current rate (a since-start average would
    keep reporting it forever)."""
    from tiered_storage_for_apache_kafka_spark.metrics import Metrics

    now = [0.0]
    m = Metrics(clock=lambda: now[0], num_samples=2,
                sample_window_seconds=30.0)
    m.inc("upload.bytes", 3000)
    now[0] = 10.0
    assert m.windowed_rate("upload.bytes") == 3000 / 30.0
    # burst ages out entirely after num_samples * window
    now[0] = 100.0
    assert m.windowed_rate("upload.bytes") == 0.0
    # new activity measures fresh
    m.inc("upload.bytes", 600)
    now[0] = 105.0
    assert m.windowed_rate("upload.bytes") == 600 / 30.0
    # recording level validated like the reference config
    import pytest as _pytest

    with _pytest.raises(ValueError, match="recording level"):
        Metrics(recording_level="VERBOSE")


def test_group_rate_is_one_sensor_not_a_sum():
    """Review finding (r6 pass 4): tagged increments feed ONE untagged
    aggregate sampler per base name, so a skewed-in-time tag mix does
    not over-report the JMX group rate."""
    from tiered_storage_for_apache_kafka_spark.metrics import Metrics

    now = [0.0]
    m = Metrics(clock=lambda: now[0], num_samples=2,
                sample_window_seconds=30.0)
    m.inc("upload.bytes", 300, object_type="log")
    now[0] = 54.0
    m.inc("upload.bytes", 300, object_type="indexes")
    now[0] = 59.0
    ref = m.reference_snapshot()
    # one sensor spanning both samples: 600 bytes over max(59, 30) s
    assert abs(ref["object-upload-bytes-rate"] - 600 / 59.0) < 1e-9


def test_recording_level_gates_sensors():
    from tiered_storage_for_apache_kafka_spark.metrics import Metrics

    info = Metrics(recording_level="INFO")
    info.inc("fine.grained", 5, level="DEBUG")
    info.inc("normal", 1)
    assert "fine.grained" not in info.snapshot()
    assert info.snapshot()["normal"] == 1

    debug = Metrics(recording_level="DEBUG")
    debug.inc("fine.grained", 5, level="DEBUG")
    debug.inc("tracey", 1, level="TRACE")
    snap = debug.snapshot()
    assert snap["fine.grained"] == 5
    assert "tracey" not in snap


def test_caching_catalog_never_expire_and_pristine(tmp_path):
    """Review findings (r6 pass 4): expiration=-1 means NEVER expire
    (not 'off'), and a caller mutating a miss-path response cannot
    corrupt the cache."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CachingCatalog,
    )

    class FakeInner:
        namespace = "default"
        loads = 0

        def load_table(self, t):
            self.loads += 1
            return {"metadata": {"current-snapshot-id": 7, "snapshots": []}}

    now = [0.0]
    inner = FakeInner()
    cat = CachingCatalog(inner, expiration_seconds=-1, clock=lambda: now[0])
    first = cat.load_table("t")
    first["metadata"]["current-snapshot-id"] = 999  # caller mutates
    now[0] = 1e9  # far future: -1 never expires
    again = cat.load_table("t")
    assert inner.loads == 1  # served from cache forever
    assert again["metadata"]["current-snapshot-id"] == 7  # pristine
