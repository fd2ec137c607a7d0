"""Segment-indexes byte cache (R11's cache tier).

Parity: ``core/.../fetch/index/MemorySegmentIndexesCache.java:49-147`` —
the reference keeps fetched aux-index bytes in a dedicated Caffeine cache:
byte-weighted (``DEFAULT_MAX_SIZE_BYTES = 10 MiB``, :55), keyed
``SegmentIndexKey(objectKey, indexType)``, single-flight via
``asMap().compute`` (:100-110), ``expireAfterAccess`` retention
(``CacheConfig.CACHE_RETENTION_MS_DEFAULT = 600 s``), waiter-bounded by
``getTimeout``. Wired at ``KafkaRemoteStorageManager.java:548-576`` so a
broker consulting the offset/timestamp index on every remote lookup does
one object-store GET per (segment, index type), not one per call.

This Python rendition reuses the ``ChunkCache`` machinery (same LRU +
single-flight + TTL semantics, already TTL/eviction-tested) with keys
``(segment_uuid, index_type)`` and its own metric namespace so
``engine_metrics_snapshot`` can tell chunk-cache traffic from index-cache
traffic — mirroring the reference's separate ``segment-indexes-cache-
metrics`` group (:53).

On a Spark cluster each executor owns one instance (process-local, like
the per-broker reference cache); 10 MiB holds the aux indexes of hundreds
of segments, so the hot offset/time indexes of the segments an executor
is scanning stay resident.
"""

from __future__ import annotations

from typing import Callable

from tiered_storage_for_apache_kafka_spark.fetch.cache import MemoryChunkCache

DEFAULT_MAX_SIZE_BYTES = 10 * 1024 * 1024  # MemorySegmentIndexesCache.java:55


class MemorySegmentIndexesCache(MemoryChunkCache):
    """Byte-weighted single-flight TTL cache for fetched aux-index bytes,
    keyed ``(segment_uuid, index_type)``."""

    def __init__(
        self,
        max_bytes: int = DEFAULT_MAX_SIZE_BYTES,
        retention_seconds: float | None = 600.0,
        get_timeout_seconds: float | None = 10.0,
        clock: Callable[[], float] | None = None,
    ):
        super().__init__(
            max_bytes=max_bytes,
            retention_seconds=retention_seconds,
            clock=clock,
        )
        # Caffeine waiters are bounded by CacheConfig.getTimeout()
        # (MemorySegmentIndexesCache.java:111); apply the same bound to
        # single-flight waiters here.
        self.wait_timeout = get_timeout_seconds
        self.metric_prefix = "index_cache"
