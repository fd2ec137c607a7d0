"""Segment-indexes byte cache (R11 cache tier) — parity with
``fetch/index/MemorySegmentIndexesCache.java:49-147``: second fetch of
the same (segment, index type) does ZERO backend GETs; TTL
expire-after-access with injectable clock; byte-weighted eviction;
single-flight concurrent loads; invalidation on segment delete."""

from __future__ import annotations

import threading

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentData,
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.fetch.index_cache import (
    MemorySegmentIndexesCache,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange
from tiered_storage_for_apache_kafka_spark.storage.filesystem import FileSystemStorage
from tiered_storage_for_apache_kafka_spark.transform.encryption import RsaKeyring

META = SegmentMetadata(
    topic="t0", topic_id="tid0", partition=0, start_offset=0,
    end_offset=100, segment_uuid="idx-seg-1",
)
INDEXES = {
    "offset": b"O" * 400,
    "timestamp": b"T" * 300,
    "producerSnapshot": b"snap",
    "leaderEpoch": b"epochs",
}


class CountingBackend:
    """Wraps a backend, counting fetch() calls per key."""

    def __init__(self, inner):
        self.inner = inner
        self.fetch_calls: list[str] = []

    def fetch(self, key, byte_range: BytesRange | None = None):
        self.fetch_calls.append(key)
        return self.inner.fetch(key, byte_range)

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def gets_of(self, suffix: str) -> int:
        return sum(1 for k in self.fetch_calls if k.endswith(suffix))


def make_manager(tmp_path, clock=None, keyring=None, index_cache=None):
    backend = CountingBackend(FileSystemStorage(tmp_path / "store"))
    mgr = TieredStorageManager(
        backend,
        chunk_size=1024,
        encryption_keyring=keyring,
        clock=clock,
        index_cache=index_cache,
    )
    mgr.copy_log_segment_data(META, SegmentData(b"x" * 4096, dict(INDEXES)))
    backend.fetch_calls.clear()
    return mgr, backend


def test_second_fetch_does_zero_backend_gets(tmp_path):
    mgr, backend = make_manager(tmp_path)
    assert mgr.fetch_index(META, "offset") == INDEXES["offset"]
    assert backend.gets_of(".indexes") == 1
    # hit: same bytes, no new GET
    assert mgr.fetch_index(META, "offset") == INDEXES["offset"]
    assert backend.gets_of(".indexes") == 1
    # a different index type is a different key → one more GET
    assert mgr.fetch_index(META, "timestamp") == INDEXES["timestamp"]
    assert backend.gets_of(".indexes") == 2
    assert mgr._index_cache.hits == 1
    assert mgr._index_cache.misses == 2


def test_metrics_bridge(tmp_path):
    mgr, _ = make_manager(tmp_path)
    mgr.fetch_index(META, "offset")
    mgr.fetch_index(META, "offset")
    snap = mgr.metrics.snapshot()
    assert snap["index_cache.misses"] == 1
    assert snap["index_cache.hits"] == 1


def test_ttl_expire_after_access(tmp_path):
    now = [0.0]
    mgr, backend = make_manager(tmp_path, clock=lambda: now[0])
    mgr.fetch_index(META, "offset")
    assert backend.gets_of(".indexes") == 1
    # accesses inside the 600 s window refresh the timestamp
    now[0] = 500.0
    mgr.fetch_index(META, "offset")
    now[0] = 1000.0  # 500 s after last ACCESS → still cached
    mgr.fetch_index(META, "offset")
    assert backend.gets_of(".indexes") == 1
    # > 600 s idle → expired, refetches
    now[0] = 1601.0
    assert mgr.fetch_index(META, "offset") == INDEXES["offset"]
    assert backend.gets_of(".indexes") == 2


def test_byte_weighted_eviction(tmp_path):
    # cache smaller than offset+timestamp together → LRU evicts
    cache = MemorySegmentIndexesCache(max_bytes=500)
    mgr, backend = make_manager(tmp_path, index_cache=cache)
    mgr.fetch_index(META, "offset")      # 400 B
    mgr.fetch_index(META, "timestamp")   # 300 B → evicts offset
    assert backend.gets_of(".indexes") == 2
    mgr.fetch_index(META, "timestamp")   # still cached
    assert backend.gets_of(".indexes") == 2
    mgr.fetch_index(META, "offset")      # evicted → refetch
    assert backend.gets_of(".indexes") == 3


def test_single_flight_concurrent_fetch(tmp_path):
    mgr, backend = make_manager(tmp_path)
    gate = threading.Event()
    inner_fetch = backend.inner.fetch

    def slow_fetch(key, byte_range=None):
        backend.fetch_calls.append(key)
        if key.endswith(".indexes"):
            gate.wait(5)
        return inner_fetch(key, byte_range)

    backend.fetch = slow_fetch
    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(mgr.fetch_index(META, "offset"))
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    # let all threads pile onto the in-flight future, then release
    import time

    time.sleep(0.2)
    gate.set()
    for t in threads:
        t.join(10)
    assert results == [INDEXES["offset"]] * 8
    assert backend.gets_of(".indexes") == 1  # exactly one load for 8 callers


def test_delete_invalidates_index_cache(tmp_path):
    mgr, _ = make_manager(tmp_path)
    mgr.fetch_index(META, "offset")
    mgr.fetch_index(META, "timestamp")
    assert len(mgr._index_cache._data) == 2
    mgr.delete_log_segment_data(META)
    assert len(mgr._index_cache._data) == 0


def test_encrypted_index_cached_post_decrypt(tmp_path):
    keyring = RsaKeyring.generate()
    mgr, backend = make_manager(tmp_path, keyring=keyring)
    assert mgr.fetch_index(META, "offset") == INDEXES["offset"]
    assert mgr.fetch_index(META, "offset") == INDEXES["offset"]
    assert backend.gets_of(".indexes") == 1


def test_empty_index_not_a_backend_get(tmp_path):
    mgr, backend = make_manager(tmp_path)
    # producerSnapshot exists but re-upload a segment with an empty one
    meta2 = SegmentMetadata(
        topic="t0", topic_id="tid0", partition=0, start_offset=200,
        end_offset=300, segment_uuid="idx-seg-2",
    )
    mgr.copy_log_segment_data(
        meta2, SegmentData(b"y" * 1024, {**INDEXES, "producerSnapshot": b""})
    )
    backend.fetch_calls.clear()
    assert mgr.fetch_index(meta2, "producerSnapshot") == b""
    assert backend.gets_of(".indexes") == 0


def test_invalidation_races_inflight_load(tmp_path):
    """Review finding (r6): a load in flight when the segment is deleted
    must not re-insert the deleted segment's bytes after invalidation."""
    mgr, backend = make_manager(tmp_path)
    gate = threading.Event()
    started = threading.Event()
    inner_fetch = backend.inner.fetch

    def slow_fetch(key, byte_range=None):
        backend.fetch_calls.append(key)
        if key.endswith(".indexes"):
            started.set()
            gate.wait(5)
        return inner_fetch(key, byte_range)

    backend.fetch = slow_fetch
    result = []
    t = threading.Thread(
        target=lambda: result.append(mgr.fetch_index(META, "offset"))
    )
    t.start()
    started.wait(5)
    # delete lands while the load is mid-flight
    mgr._index_cache.invalidate_object(META.segment_uuid)
    gate.set()
    t.join(10)
    # the in-flight caller still got its bytes (load predates delete)...
    assert result == [INDEXES["offset"]]
    # ...but nothing was cached: the deleted segment cannot serve from
    # cache afterwards
    assert (META.segment_uuid, "offset") not in mgr._index_cache._data


def test_manifest_lookup_single_flight(tmp_path):
    """Concurrent COLD manifest lookups do exactly one backend GET
    (MemorySegmentManifestCache's Caffeine compute semantics)."""
    import time

    mgr, backend = make_manager(tmp_path)
    # evict the write-through entry so the lookup is cold
    with mgr._manifest_lock:
        mgr._manifest_cache.clear()
    gate = threading.Event()
    inner_fetch = backend.inner.fetch

    def slow_fetch(key, byte_range=None):
        backend.fetch_calls.append(key)
        if key.endswith(".rsm-manifest"):
            gate.wait(5)
        return inner_fetch(key, byte_range)

    backend.fetch = slow_fetch
    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(mgr.segment_manifest(META))
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    time.sleep(0.2)
    gate.set()
    for t in threads:
        t.join(10)
    assert len(results) == 8
    assert all(m is results[0] for m in results)
    assert backend.gets_of(".rsm-manifest") == 1  # one load for 8 callers


def test_manifest_single_flight_failure_retries(tmp_path):
    """A failing owner propagates to no one else permanently: waiters
    retry the load themselves."""
    mgr, backend = make_manager(tmp_path)
    with mgr._manifest_lock:
        mgr._manifest_cache.clear()
    calls = {"n": 0}
    inner_fetch = backend.inner.fetch

    def flaky_fetch(key, byte_range=None):
        backend.fetch_calls.append(key)
        if key.endswith(".rsm-manifest"):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("transient backend failure")
        return inner_fetch(key, byte_range)

    backend.fetch = flaky_fetch
    import pytest as _pytest

    with _pytest.raises(OSError):
        mgr.segment_manifest(META)
    # next caller retries and succeeds
    assert mgr.segment_manifest(META).chunk_index.original_file_size == 4096
