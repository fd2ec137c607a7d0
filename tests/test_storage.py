"""Storage layer: filesystem backend, object keys, rate limiter, caches."""

from __future__ import annotations

import threading
import time

import pytest

from tiered_storage_for_apache_kafka_spark.fetch.cache import (
    DiskChunkCache,
    MemoryChunkCache,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import (
    BytesRange,
    InvalidRangeError,
    KeyNotFoundError,
)
from tiered_storage_for_apache_kafka_spark.storage.filesystem import FileSystemStorage
from tiered_storage_for_apache_kafka_spark.storage.object_key import (
    ObjectKeyFactory,
    Suffix,
)
from tiered_storage_for_apache_kafka_spark.storage.rate_limiter import (
    RateLimitedStream,
    TokenBucket,
)


class TestBytesRange:
    def test_inclusive_size(self):
        assert BytesRange(0, 0).size == 1
        assert BytesRange(10, 19).size == 10
        assert BytesRange.of_size(5, 3) == BytesRange(5, 7)

    def test_invalid(self):
        with pytest.raises(InvalidRangeError):
            BytesRange(-1, 5)
        with pytest.raises(InvalidRangeError):
            BytesRange(5, 4)
        with pytest.raises(InvalidRangeError):
            BytesRange.of_size(0, 0)

    def test_long_positions(self):
        # 64-bit positions (the reference is int-bounded; we are not)
        r = BytesRange(0, 5 * 1024**4)
        assert r.size == 5 * 1024**4 + 1


class TestObjectKey:
    def test_scheme(self):
        f = ObjectKeyFactory(prefix="tier/")
        key = f.key("payments", "tidX", 3, 1234, "uuid-1", Suffix.LOG)
        assert key == "tier/payments-tidX/3/00000000000000001234-uuid-1.log"

    def test_lexicographic_equals_numeric_order(self):
        f = ObjectKeyFactory()
        keys = [f.key("t", "id", 0, off, "u", Suffix.LOG) for off in [9, 10, 100, 99999]]
        assert keys == sorted(keys)

    def test_all_suffixes(self):
        f = ObjectKeyFactory()
        ks = f.all_keys("t", "id", 0, 0, "u")
        assert {k.rsplit(".", 1)[1] for k in ks.values()} == {
            "log",
            "indexes",
            "rsm-manifest",
        }


class TestFileSystemStorage:
    def test_upload_fetch_roundtrip(self, tmp_path):
        fs = FileSystemStorage(tmp_path)
        fs.upload("a/b/c.log", b"hello world")
        with fs.fetch("a/b/c.log") as f:
            assert f.read() == b"hello world"

    def test_ranged_fetch_and_clamp(self, tmp_path):
        fs = FileSystemStorage(tmp_path)
        fs.upload("k", bytes(range(100)))
        with fs.fetch("k", BytesRange(10, 19)) as f:
            assert f.read() == bytes(range(10, 20))
        # end beyond size clamps
        with fs.fetch("k", BytesRange(90, 500)) as f:
            assert f.read() == bytes(range(90, 100))
        with pytest.raises(InvalidRangeError):
            fs.fetch("k", BytesRange(100, 101))

    def test_missing_key(self, tmp_path):
        fs = FileSystemStorage(tmp_path)
        with pytest.raises(KeyNotFoundError):
            fs.fetch("nope")

    def test_delete_gcs_empty_dirs(self, tmp_path):
        fs = FileSystemStorage(tmp_path)
        fs.upload("t-id/0/seg.log", b"x")
        fs.upload("t-id/0/seg.indexes", b"y")
        fs.delete(["t-id/0/seg.log", "t-id/0/seg.indexes", "missing-is-ok"])
        assert fs.list_keys() == []
        assert not (tmp_path / "t-id").exists()

    def test_atomic_overwrite(self, tmp_path):
        fs = FileSystemStorage(tmp_path)
        fs.upload("k", b"v1")
        fs.upload("k", b"v2")
        with fs.fetch("k") as f:
            assert f.read() == b"v2"


class TestTokenBucket:
    def test_enforces_rate(self):
        bucket = TokenBucket(64 * 1024)  # 64 KiB/s
        stream = RateLimitedStream(b"z" * (96 * 1024), bucket)
        t0 = time.monotonic()
        out = bytearray()
        while True:
            c = stream.read(32 * 1024)
            if not c:
                break
            out += c
        elapsed = time.monotonic() - t0
        assert bytes(out) == b"z" * (96 * 1024)
        # 96 KiB at 64 KiB/s with a full initial bucket → >= ~0.4s
        assert elapsed >= 0.3

    def test_refund_on_short_read(self):
        bucket = TokenBucket(1 << 20)
        stream = RateLimitedStream(b"ab", bucket)
        stream.read(1024)
        assert bucket._tokens > (1 << 20) - 100


class TestChunkCaches:
    @pytest.mark.parametrize("kind", ["memory", "disk"])
    def test_hit_miss_and_single_flight(self, kind, tmp_path):
        cache = (
            MemoryChunkCache(1 << 20)
            if kind == "memory"
            else DiskChunkCache(tmp_path / "cache", 1 << 20)
        )
        calls = []
        barrier = threading.Barrier(4)

        def loader():
            calls.append(1)
            time.sleep(0.05)
            return b"chunk-data"

        def get():
            barrier.wait()
            assert cache.get_chunk(("seg", 0), loader) == b"chunk-data"

        threads = [threading.Thread(target=get) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(calls) == 1  # single-flight: one load for 4 concurrent gets
        assert cache.get_chunk(("seg", 0), loader) == b"chunk-data"
        assert cache.hits >= 1 and cache.misses == 1

    def test_byte_weighted_eviction(self):
        cache = MemoryChunkCache(max_bytes=100)
        cache.get_chunk(("s", 0), lambda: b"a" * 60)
        cache.get_chunk(("s", 1), lambda: b"b" * 60)  # evicts chunk 0
        calls = []
        cache.get_chunk(("s", 0), lambda: (calls.append(1), b"a" * 60)[1])
        assert calls == [1]

    def test_disk_cache_atomic_layout(self, tmp_path):
        cache = DiskChunkCache(tmp_path / "c", 1 << 20)
        cache.get_chunk(("topic-x/0/seg.log", 7), lambda: b"payload")
        files = list((tmp_path / "c").rglob("*"))
        assert any(f.name == "7" for f in files)


class TestMetrics:
    def test_manager_metrics_counters(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.api import (
            SegmentData,
            SegmentMetadata,
            TieredStorageManager,
        )

        mgr = TieredStorageManager(FileSystemStorage(tmp_path), chunk_size=1024)
        meta = SegmentMetadata("t", "tid", 0, 0, 9, "u")
        mgr.copy_log_segment_data(
            meta,
            SegmentData(b"x" * 5000, {"offset": b"o", "timestamp": b"t",
                                      "producerSnapshot": b"p", "leaderEpoch": b"l"}),
        )
        b"".join(mgr.fetch_log_segment(meta, 0, 999))
        mgr.delete_log_segment_data(meta)
        snap = mgr.metrics.snapshot()
        assert snap["upload.bytes[object_type=log]"] == 5000
        assert snap["segment.copy[topic=t].count"] == 1
        assert snap["segment.copy[topic=t].seconds"] > 0
        assert snap["fetch.requested.bytes[topic=t]"] == 1000
        assert snap["segment.delete[topic=t]"] == 1


class TestCacheTtlRetention:
    """Time-based retention (reference `expireAfterAccess(retention.ms)`,
    CacheConfig.java:31 / ChunkCache.java:147 / MemorySegmentManifestCache
    .java:109): injected clock, no sleeps."""

    def _clock(self):
        state = {"t": 0.0}

        def clock():
            return state["t"]

        return state, clock

    def test_memory_cache_expires_after_access(self):
        from tiered_storage_for_apache_kafka_spark.fetch.cache import MemoryChunkCache

        state, clock = self._clock()
        cache = MemoryChunkCache(retention_seconds=600.0, clock=clock)
        loads = []

        def loader():
            loads.append(1)
            return b"x" * 10

        cache.get_chunk(("seg", 0), loader)
        state["t"] = 500.0
        cache.get_chunk(("seg", 0), loader)  # hit; refreshes access time
        assert len(loads) == 1
        # 601 s after the LAST ACCESS (t=500) -> still fresh at t=1000
        state["t"] = 1000.0
        cache.get_chunk(("seg", 0), loader)
        assert len(loads) == 1
        # now step past retention with no access in between -> reload
        state["t"] = 1701.0
        cache.get_chunk(("seg", 0), loader)
        assert len(loads) == 2
        assert cache._weight == 10  # expired entry's weight released

    def test_memory_cache_infinite_retention(self):
        from tiered_storage_for_apache_kafka_spark.fetch.cache import MemoryChunkCache

        state, clock = self._clock()
        cache = MemoryChunkCache(retention_seconds=None, clock=clock)
        loads = []
        cache.get_chunk(("seg", 0), lambda: loads.append(1) or b"v")
        state["t"] = 1e9
        cache.get_chunk(("seg", 0), lambda: loads.append(1) or b"v")
        assert len(loads) == 1

    def test_disk_cache_expiry_unlinks_file(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.fetch.cache import DiskChunkCache

        state, clock = self._clock()
        cache = DiskChunkCache(tmp_path, retention_seconds=600.0, clock=clock)
        loads = []

        def loader():
            loads.append(1)
            return b"payload"

        cache.get_chunk(("obj/seg.log", 3), loader)
        path = cache._file(("obj/seg.log", 3))
        assert path.exists()
        state["t"] = 601.0
        cache.get_chunk(("obj/seg.log", 3), loader)
        assert len(loads) == 2  # expired -> reloaded
        assert cache._weight == len(b"payload")

    def test_manifest_cache_expires_after_access(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.api import (
            SegmentMetadata,
            TieredStorageManager,
        )
        from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
            FileSystemStorage,
        )

        state, clock = self._clock()
        mgr = TieredStorageManager(
            FileSystemStorage(tmp_path),
            chunk_size=64,
            manifest_retention_seconds=3600.0,
            clock=clock,
        )
        meta = SegmentMetadata(
            topic="t", topic_id="tid", partition=0, start_offset=0,
            end_offset=9, segment_uuid="u1",
        )
        from tiered_storage_for_apache_kafka_spark.api import SegmentData

        indexes = {
            "offset": b"o" * 16,
            "timestamp": b"t" * 16,
            "producerSnapshot": b"s",
            "leaderEpoch": b"e",
        }
        mgr.copy_log_segment_data(meta, SegmentData(b"a" * 200, indexes))
        fetches = {"n": 0}
        orig_fetch = mgr.backend.fetch

        def counting_fetch(key, *a, **kw):
            if key.endswith("rsm-manifest"):
                fetches["n"] += 1
            return orig_fetch(key, *a, **kw)

        mgr.backend.fetch = counting_fetch
        mgr._manifest(meta)  # cached by the copy -> no GET
        assert fetches["n"] == 0
        state["t"] = 3601.0  # past 1 h since last access
        mgr._manifest(meta)
        assert fetches["n"] == 1
        state["t"] = 3700.0  # fresh again (access refreshed)
        mgr._manifest(meta)
        assert fetches["n"] == 1
