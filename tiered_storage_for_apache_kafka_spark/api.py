"""The 5-method tiered-storage facade — the engine's public API surface.

Parity with KIP-405 ``RemoteStorageManager`` (``core/.../RemoteStorage
Manager.java:48-201``): configure, copy_log_segment_data, fetch_log_segment,
fetch_index, delete_log_segment_data. Classic (byte-fidelity) mode over the
Python storage layer; the table mode rides Spark (`streaming/ingest.py`).

Upload layout per segment (ObjectKeyFactory scheme):
- ``...-<uuid>.log``          — chunked/compressed/encrypted segment bytes
- ``...-<uuid>.indexes``      — 5 aux indexes concatenated (encrypted when
                                encryption is on; never chunk-split)
- ``...-<uuid>.rsm-manifest`` — JSON manifest (chunk index, index
                                locations, compression flag, wrapped DEK)

Failure of any upload best-effort deletes all three objects
(`KafkaRemoteStorageManager.java:211-220` atomic-upload-or-cleanup).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import BinaryIO, Iterator

from tiered_storage_for_apache_kafka_spark.fetch.cache import ChunkCache
from tiered_storage_for_apache_kafka_spark.fetch.chunk_manager import ChunkManager
from tiered_storage_for_apache_kafka_spark.manifest.manifest import (
    INDEX_TYPES,
    EncryptionMetadata,
    IndexLocation,
    SegmentIndexes,
    SegmentManifest,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import (
    BytesRange,
    StorageBackend,
)
from tiered_storage_for_apache_kafka_spark.storage.object_key import (
    ObjectKeyFactory,
    Suffix,
)
from tiered_storage_for_apache_kafka_spark.storage.rate_limiter import (
    RateLimitedStream,
    TokenBucket,
)
from tiered_storage_for_apache_kafka_spark.transform.compression import (
    DEFAULT_CODEC,
    requires_compression,
    segment_already_compressed,
)
from tiered_storage_for_apache_kafka_spark.transform.encryption import (
    DataKeyAndAAD,
    RsaKeyring,
    create_data_key_and_aad,
    decrypt_chunks,
    encrypt_chunks,
)
from tiered_storage_for_apache_kafka_spark.transform.pipeline import transform


@dataclass(frozen=True)
class SegmentMetadata:
    """KIP-405 RemoteLogSegmentMetadata essentials."""

    topic: str
    topic_id: str
    partition: int
    start_offset: int
    end_offset: int
    segment_uuid: str
    extra: dict = field(default_factory=dict)


@dataclass
class SegmentData:
    """The segment bytes plus its aux indexes (TRANSACTION optional)."""

    log: bytes
    indexes: dict[str, bytes]  # index type name -> bytes


class TieredStorageManager:
    def __init__(
        self,
        backend: StorageBackend,
        chunk_size: int = 4 * 1024 * 1024,
        compression_enabled: bool = False,
        compression_heuristic_enabled: bool = False,
        encryption_keyring: RsaKeyring | None = None,
        cache: ChunkCache | None = None,
        key_prefix: str = "",
        key_prefix_mask: bool = False,
        codec: str = DEFAULT_CODEC,
        upload_rate_limit_bytes_per_second: int | None = None,
        manifest_retention_seconds: float | None = 3600.0,
        clock=None,
        index_cache: ChunkCache | None = None,
        custom_metadata_fields: list[str] | None = None,
        metrics=None,
    ):
        self.backend = backend
        self.chunk_size = chunk_size
        self.compression_enabled = compression_enabled
        self.compression_heuristic_enabled = compression_heuristic_enabled
        self.keyring = encryption_keyring
        self.codec = codec
        self.keys = ObjectKeyFactory(key_prefix, mask_prefix=key_prefix_mask)
        self.chunk_manager = ChunkManager(
            backend, cache, codec, display_key=self.keys.display
        )
        self.rate_limiter = (
            TokenBucket(upload_rate_limit_bytes_per_second)
            if upload_rate_limit_bytes_per_second
            else None
        )
        from tiered_storage_for_apache_kafka_spark.metrics import Metrics

        self.metrics = metrics if metrics is not None else Metrics()
        if cache is not None and getattr(cache, "metrics", None) is None:
            # bridge cache hit/miss stats into the engine metrics
            # (reference `metrics/CaffeineStatsCounter.java` parity)
            cache.metrics = self.metrics
        # per-segment DEK cache (manifest holds only the wrapped DEK)
        self._dek_cache: dict[str, DataKeyAndAAD] = {}
        # bounded LRU of segment manifests (reference: caffeine-cached
        # manifest lookups, `KafkaRemoteStorageManager` R1): a ranged
        # fetch is index GET + log GET, each needing the manifest —
        # without this every boundary-segment read pays a redundant
        # manifest round-trip
        # values are (manifest, last-access ts): retention mirrors the
        # reference's `expireAfterAccess` manifest cache
        # (`fetch/manifest/MemorySegmentManifestCache.java:51-52,109` —
        # 1 h default); None = infinite. Injectable clock for tests.
        self._manifest_cache: OrderedDict[str, tuple[SegmentManifest, float]] = (
            OrderedDict()
        )
        # reference default: MemorySegmentManifestCache.java:51 (1000)
        self._manifest_cache_size = 1000
        self._manifest_retention = manifest_retention_seconds
        import time as _time

        self._clock = clock or _time.monotonic
        # fetches may run concurrently (the chunk cache is single-flight
        # across threads); OrderedDict reorder/evict needs the same care
        self._manifest_lock = threading.Lock()
        self._manifest_inflight: dict = {}
        # Segment-indexes byte cache (R11): the reference ALWAYS wires a
        # dedicated 10 MiB byte-weighted single-flight TTL cache for
        # fetched aux-index bytes (`fetch/index/MemorySegmentIndexesCache
        # .java:49-147`, wired `KafkaRemoteStorageManager.java:548-576`)
        # — brokers hit the offset/time indexes on every remote lookup.
        if index_cache is None:
            from tiered_storage_for_apache_kafka_spark.fetch.index_cache import (
                MemorySegmentIndexesCache,
            )

            index_cache = MemorySegmentIndexesCache(clock=clock)
        self._index_cache = index_cache
        if getattr(self._index_cache, "metrics", None) is None:
            self._index_cache.metrics = self.metrics
        # which tagged fields enter the broker-facing custom metadata
        # (reference `custom.metadata.fields.include`, names from
        # `SegmentCustomMetadataField.java:31-33`; None = all — the
        # engine's historical default; the reference's config default
        # is the empty list, applied by config.configure())
        allowed = {"REMOTE_SIZE", "OBJECT_PREFIX", "OBJECT_KEY"}
        if custom_metadata_fields is None:
            self.custom_metadata_fields = allowed
        else:
            bad = set(custom_metadata_fields) - allowed
            if bad:
                raise ValueError(
                    f"unknown custom metadata fields {sorted(bad)}; "
                    f"allowed: {sorted(allowed)}"
                )
            self.custom_metadata_fields = set(custom_metadata_fields)
        # thread-pool gauges per cache (ThreadPoolMonitor.java parity)
        if cache is not None and getattr(cache, "_pool", None) is not None:
            self.metrics.register_pool("chunk-cache", cache._pool)
        if getattr(self._index_cache, "_pool", None) is not None:
            self.metrics.register_pool(
                "segment-indexes-cache", self._index_cache._pool
            )

    # -- helpers ---------------------------------------------------------------

    def _object_keys(self, meta: SegmentMetadata) -> dict[Suffix, str]:
        return self.keys.all_keys(
            meta.topic, meta.topic_id, meta.partition, meta.start_offset, meta.segment_uuid
        )

    def _upload(self, key: str, data: bytes) -> int:
        stream: BinaryIO | bytes = data
        if self.rate_limiter is not None:
            stream = RateLimitedStream(data, self.rate_limiter)
        return self.backend.upload(key, stream)

    def _segment_key(self, manifest: SegmentManifest) -> DataKeyAndAAD | None:
        if manifest.encryption is None:
            return None
        cached = self._dek_cache.get(manifest.segment_uuid)
        if cached is None:
            if self.keyring is None:
                raise RuntimeError("manifest is encrypted but no keyring configured")
            dek = self.keyring.unwrap(manifest.encryption.data_key)
            cached = DataKeyAndAAD(dek, manifest.encryption.aad)
            self._dek_cache[manifest.segment_uuid] = cached
        return cached

    # -- API -------------------------------------------------------------------

    def copy_log_segment_data(self, meta: SegmentMetadata, data: SegmentData) -> dict:
        """Ingest one closed segment; returns custom metadata (sizes +
        object keys — `SegmentCustomMetadataBuilder` analog)."""
        keys = self._object_keys(meta)
        uploaded: list[str] = []
        with self.metrics.time("segment.copy", topic=meta.topic):
            return self._copy_inner(meta, data, keys, uploaded)

    def _copy_inner(
        self,
        meta: SegmentMetadata,
        data: SegmentData,
        keys: dict[Suffix, str],
        uploaded: list[str],
    ) -> dict:
        try:
            compression = self.compression_enabled
            if compression and self.compression_heuristic_enabled:
                # W3: prefer the reference's exact check — the first Kafka
                # batch's compression attribute (SegmentCompressionChecker.
                # java:31-54); fall back to a ratio probe for non-Kafka
                # framings
                flagged = segment_already_compressed(data.log[:64])
                if flagged is not None:
                    compression = not flagged
                else:
                    sample = data.log[: min(len(data.log), self.chunk_size or 65536)]
                    compression = requires_compression(sample, self.codec)

            enc_key = create_data_key_and_aad() if self.keyring else None

            result = transform(
                data.log,
                self.chunk_size,
                compression=compression,
                encryption_key=enc_key,
                codec=self.codec,
            )
            self._upload(keys[Suffix.LOG], result.data)
            self.metrics.inc("upload.bytes", len(result.data), object_type="log")
            self.metrics.inc("upload.requests", object_type="log")
            uploaded.append(keys[Suffix.LOG])

            # aux indexes: transform each (no chunking; encrypt-only), concat
            locations: dict[str, IndexLocation] = {}
            blob = bytearray()
            for index_type in INDEX_TYPES:
                if index_type not in data.indexes:
                    continue
                payload = data.indexes[index_type]
                if enc_key is not None:
                    payload = next(encrypt_chunks(iter([payload]), enc_key))
                locations[index_type] = IndexLocation(len(blob), len(payload))
                blob += payload
            self._upload(keys[Suffix.INDEXES], bytes(blob))
            self.metrics.inc("upload.bytes", len(blob), object_type="indexes")
            self.metrics.inc("upload.requests", object_type="indexes")
            uploaded.append(keys[Suffix.INDEXES])

            encryption_meta = None
            if enc_key is not None:
                assert self.keyring is not None
                encryption_meta = EncryptionMetadata(
                    data_key=self.keyring.wrap(enc_key.data_key), aad=enc_key.aad
                )
                self._dek_cache[meta.segment_uuid] = enc_key

            manifest = SegmentManifest(
                segment_uuid=meta.segment_uuid,
                chunk_index=result.chunk_index,
                segment_indexes=SegmentIndexes(locations),
                compression=compression,
                encryption=encryption_meta,
                kafka_metadata={
                    "topic": meta.topic,
                    "topicId": meta.topic_id,
                    "partition": meta.partition,
                    "startOffset": meta.start_offset,
                    "endOffset": meta.end_offset,
                },
            )
            manifest_bytes = manifest.to_json().encode()
            self._upload(keys[Suffix.MANIFEST], manifest_bytes)
            # the writer has the freshest manifest in hand: cache it
            # (also ensures a re-copied uuid never serves the superseded
            # one) — the first read after copy skips the manifest GET
            with self._manifest_lock:
                self._manifest_cache[meta.segment_uuid] = (manifest, self._clock())
                while len(self._manifest_cache) > self._manifest_cache_size:
                    self._manifest_cache.popitem(last=False)
                # an older fetch in flight must not clobber this fresher
                # write-through when it completes (its owner checks the
                # registration before caching)
                self._manifest_inflight.pop(meta.segment_uuid, None)
            self.metrics.inc("upload.bytes", len(manifest_bytes), object_type="manifest")
            self.metrics.inc("upload.requests", object_type="manifest")
            uploaded.append(keys[Suffix.MANIFEST])

            from tiered_storage_for_apache_kafka_spark.metadata_serde import (
                OBJECT_KEY,
                OBJECT_PREFIX,
                REMOTE_SIZE,
                serialize_custom_metadata,
            )

            remote_size = len(result.data) + len(blob) + len(manifest_bytes)
            return {
                "remote_size": remote_size,
                "object_prefix": self.keys.prefix,
                "object_keys": {s.value: k for s, k in keys.items()},
                # broker-facing form: Kafka-protocol tagged fields (W13,
                # `SegmentCustomMetadataSerde.java` wire compatibility)
                "custom_metadata": serialize_custom_metadata(
                    {
                        tag: value
                        for name, tag, value in (
                            ("REMOTE_SIZE", REMOTE_SIZE, remote_size),
                            ("OBJECT_PREFIX", OBJECT_PREFIX, self.keys.prefix),
                            ("OBJECT_KEY", OBJECT_KEY, keys[Suffix.LOG]),
                        )
                        if name in self.custom_metadata_fields
                    }
                ),
            }
        except BaseException:
            # atomic upload-or-cleanup (W12)
            self.metrics.inc("segment.copy.failures")
            self.backend.delete(uploaded)
            raise

    def _manifest(self, meta: SegmentMetadata) -> SegmentManifest:
        # Single-flight cold loads — the reference's Caffeine manifest
        # cache computes once per key under concurrency
        # (`MemorySegmentManifestCache.java` get via compute). Same
        # audited shape as ChunkCache.get_chunk: the owner's exception
        # propagates to every waiter (Caffeine semantics — no serialized
        # retry chain), and the owner caches only while its future is
        # still the registered one, so a racing delete or re-copy that
        # popped it cannot be clobbered by this older load.
        from concurrent.futures import Future

        with self._manifest_lock:
            entry = self._manifest_cache.get(meta.segment_uuid)
            if entry is not None:
                manifest, ts = entry
                if (
                    self._manifest_retention is not None
                    and self._clock() - ts > self._manifest_retention
                ):
                    del self._manifest_cache[meta.segment_uuid]
                else:
                    # refresh on hit: expireAfterAccess semantics
                    self._manifest_cache[meta.segment_uuid] = (
                        manifest,
                        self._clock(),
                    )
                    self._manifest_cache.move_to_end(meta.segment_uuid)
                    self.metrics.inc("manifest_cache.hits")
                    return manifest
            fut = self._manifest_inflight.get(meta.segment_uuid)
            if fut is None:
                fut = Future()
                self._manifest_inflight[meta.segment_uuid] = fut
                owner = True
            else:
                owner = False
        if not owner:
            return fut.result()

        try:
            self.metrics.inc("manifest_cache.misses")
            key = self._object_keys(meta)[Suffix.MANIFEST]
            with self.backend.fetch(key) as f:
                manifest = SegmentManifest.from_json(f.read())
        except BaseException as e:
            with self._manifest_lock:
                if self._manifest_inflight.get(meta.segment_uuid) is fut:
                    self._manifest_inflight.pop(meta.segment_uuid)
            fut.set_exception(e)
            raise
        with self._manifest_lock:
            if self._manifest_inflight.get(meta.segment_uuid) is fut:
                # still the registered load: cache the result
                self._manifest_cache[meta.segment_uuid] = (
                    manifest, self._clock(),
                )
                while len(self._manifest_cache) > self._manifest_cache_size:
                    self._manifest_cache.popitem(last=False)
                self._manifest_inflight.pop(meta.segment_uuid)
            # else: a delete or re-copy invalidated this load mid-flight
            # — deliver to waiters, do NOT cache over the newer state
        fut.set_result(manifest)
        return manifest

    def fetch_log_segment(
        self,
        meta: SegmentMetadata,
        start_position: int,
        end_position: int | None = None,
        deadline_seconds: float | None = None,
    ) -> Iterator[bytes]:
        """Ranged read of original segment bytes; end defaults/clamps to
        segment end (inclusive semantics, `RemoteStorageManager.java:
        138-152`). `deadline_seconds` surfaces fetch timeouts explicitly
        (FetchTimeoutError) rather than the reference's silent
        empty-stream-on-interrupt (R12)."""
        manifest = self._manifest(meta)
        size = manifest.chunk_index.original_file_size
        end = size - 1 if end_position is None else min(end_position, size - 1)
        self.metrics.inc(
            "fetch.requested.bytes", end - start_position + 1, topic=meta.topic
        )
        return self.chunk_manager.fetch_range(
            self._object_keys(meta)[Suffix.LOG],
            manifest,
            BytesRange(start_position, end),
            self._segment_key(manifest),
            deadline_seconds=deadline_seconds,
        )

    def segment_manifest(self, meta: SegmentMetadata) -> SegmentManifest:
        """Cached manifest lookup (R1) — read paths that need segment
        geometry (true end offset, chunk layout) before deciding a fetch
        strategy share the LRU entry the fetch itself will use."""
        return self._manifest(meta)

    def fetch_index(self, meta: SegmentMetadata, index_type: str) -> bytes:
        """One aux index, decrypted if needed (`KafkaRemoteStorageManager.
        java:486-530`). Raises KeyError when the segment has no such index.

        Decrypted index bytes are cached in the segment-indexes cache
        (`fetch/index/MemorySegmentIndexesCache.java:49-147` parity, wired
        `KafkaRemoteStorageManager.java:548-576`): repeat lookups of the
        same (segment, index type) do zero backend GETs until TTL expiry
        or eviction. The reference caches the post-decrypt form too — its
        supplier runs fetchIndexBytes (GET + detransform) before insert."""
        manifest = self._manifest(meta)
        loc = manifest.segment_indexes.locations.get(index_type)
        if loc is None:
            raise KeyError(f"segment has no {index_type!r} index")
        if loc.size == 0:
            return b""

        def _load() -> bytes:
            key = self._object_keys(meta)[Suffix.INDEXES]
            with self.backend.fetch(
                key, BytesRange.of_size(loc.position, loc.size)
            ) as f:
                payload = f.read()
            enc_key = self._segment_key(manifest)
            if enc_key is not None:
                payload = next(decrypt_chunks(iter([payload]), enc_key))
            return payload

        return self._index_cache.get_chunk((meta.segment_uuid, index_type), _load)

    def delete_log_segment_data(self, meta: SegmentMetadata) -> None:
        self.metrics.inc("segment.delete", topic=meta.topic)
        try:
            # segment-delete-time-avg/max parity (docs/metrics.rst:26-27)
            with self.metrics.time("segment.delete.time", topic=meta.topic):
                self.backend.delete(self._object_keys(meta).values())
        except BaseException:
            # segment-delete-errors-total/-rate (docs/metrics.rst:23-24)
            self.metrics.inc("segment.delete.errors", topic=meta.topic)
            raise
        self._dek_cache.pop(meta.segment_uuid, None)
        with self._manifest_lock:
            entry = self._manifest_cache.pop(meta.segment_uuid, None)
            # in-flight loads of the deleted segment must not re-cache
            self._manifest_inflight.pop(meta.segment_uuid, None)
        if entry is not None:
            # segment-delete-bytes-total, estimated from segment size as
            # the reference does from RLMM metadata (best-effort: only
            # when the manifest is already cached; never a GET)
            self.metrics.inc(
                "segment.delete.bytes",
                entry[0].chunk_index.original_file_size,
                topic=meta.topic,
            )
        # drop cached aux-index bytes alongside the manifest entry so a
        # deleted segment can't serve stale indexes
        self._index_cache.invalidate_object(meta.segment_uuid)
