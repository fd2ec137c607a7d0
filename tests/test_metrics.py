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
