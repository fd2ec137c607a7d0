"""Full copy→fetch→delete matrix against the filesystem backend —
mirrors the reference's integration matrix (`RemoteStorageManagerTest.
java:75-150`: {cache} × {chunk size} × {compression} × {encryption} ×
{txn index}), with deliberately chunk-unaligned segment sizes and
every-boundary fetch ranges."""

from __future__ import annotations

import random

import pytest

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentData,
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.fetch.cache import (
    DiskChunkCache,
    MemoryChunkCache,
)
from tiered_storage_for_apache_kafka_spark.manifest.manifest import SegmentManifest
from tiered_storage_for_apache_kafka_spark.storage.filesystem import FileSystemStorage
from tiered_storage_for_apache_kafka_spark.transform.encryption import RsaKeyring

SEGMENT_SIZE = 123 * 1024 + 123  # deliberately chunk-unaligned (SingleBrokerTest.java:114-117)
CHUNK_SIZE = 1024

_rng = random.Random(42)
SEGMENT_BYTES = bytes(_rng.getrandbits(8) for _ in range(SEGMENT_SIZE))
INDEXES = {
    "offset": bytes(_rng.getrandbits(8) for _ in range(512)),
    "timestamp": bytes(_rng.getrandbits(8) for _ in range(256)),
    "producerSnapshot": b"snapshot",
    "leaderEpoch": b"epochs",
}
META = SegmentMetadata(
    topic="t0", topic_id="tid0", partition=0, start_offset=1000,
    end_offset=2000, segment_uuid="seg-uuid-1",
)

KEYRING = RsaKeyring.generate()  # RSA keygen is slow; share across the matrix


def make_manager(tmp_path, compression, encryption, cache_kind, txn_index, codec="zstd"):
    backend = FileSystemStorage(tmp_path / "store")
    cache = None
    if cache_kind == "memory":
        cache = MemoryChunkCache(1 << 22)
    elif cache_kind == "disk":
        cache = DiskChunkCache(tmp_path / "cache", 1 << 22)
    return TieredStorageManager(
        backend,
        chunk_size=CHUNK_SIZE,
        compression_enabled=compression,
        encryption_keyring=KEYRING if encryption else None,
        cache=cache,
        codec=codec,
    ), backend


@pytest.mark.parametrize("compression", [False, True])
@pytest.mark.parametrize("encryption", [False, True])
@pytest.mark.parametrize("cache_kind", [None, "memory", "disk"])
@pytest.mark.parametrize("txn_index", [False, True])
@pytest.mark.parametrize("codec", ["zstd", "zlib"])
def test_copy_fetch_delete_cycle(tmp_path, compression, encryption, cache_kind, txn_index, codec):
    indexes = dict(INDEXES)
    if txn_index:
        indexes["transaction"] = b"txn-index-bytes"
    mgr, backend = make_manager(tmp_path, compression, encryption, cache_kind, txn_index, codec)

    custom = mgr.copy_log_segment_data(META, SegmentData(SEGMENT_BYTES, indexes))
    assert set(custom["object_keys"]) == {"log", "indexes", "rsm-manifest"}
    assert len(backend.list_keys()) == 3

    # manifest shape (golden assertions, RemoteStorageManagerTest.java:176-203)
    with backend.fetch(custom["object_keys"]["rsm-manifest"]) as f:
        manifest = SegmentManifest.from_json(f.read())
    assert manifest.compression == compression
    assert (manifest.encryption is not None) == encryption
    assert manifest.chunk_index.original_file_size == SEGMENT_SIZE
    expected_type = "variable" if compression else "fixed"
    assert manifest.chunk_index.to_dict()["type"] == expected_type
    assert ("transaction" in manifest.segment_indexes.locations) == txn_index

    # fetch every flavor of range: full, borders, borders±1, mid-chunk,
    # single byte, last byte, beyond-end clamp
    ranges = [
        (0, None),
        (0, 0),
        (0, CHUNK_SIZE - 1),
        (CHUNK_SIZE - 1, CHUNK_SIZE),
        (CHUNK_SIZE, 2 * CHUNK_SIZE - 1),
        (CHUNK_SIZE + 17, 5 * CHUNK_SIZE + 99),
        (SEGMENT_SIZE - 1, SEGMENT_SIZE - 1),
        (SEGMENT_SIZE - 100, 10 * SEGMENT_SIZE),
        (123, 123 * 1024),
    ]
    for start, end in ranges:
        got = b"".join(mgr.fetch_log_segment(META, start, end))
        hi = SEGMENT_SIZE - 1 if end is None else min(end, SEGMENT_SIZE - 1)
        assert got == SEGMENT_BYTES[start : hi + 1], f"range {start}-{end}"

    # index fetch byte-equality (RemoteStorageManagerTest.java:205-233)
    for index_type, payload in indexes.items():
        assert mgr.fetch_index(META, index_type) == payload
    if not txn_index:
        with pytest.raises(KeyError):
            mgr.fetch_index(META, "transaction")

    mgr.delete_log_segment_data(META)
    assert backend.list_keys() == []


def test_cache_hits_on_reread(tmp_path):
    mgr, _ = make_manager(tmp_path, False, False, "memory", False)
    mgr.copy_log_segment_data(META, SegmentData(SEGMENT_BYTES, dict(INDEXES)))
    b"".join(mgr.fetch_log_segment(META, 0, 10 * CHUNK_SIZE))
    misses_after_first = mgr.chunk_manager.cache.misses
    b"".join(mgr.fetch_log_segment(META, 0, 10 * CHUNK_SIZE))
    assert mgr.chunk_manager.cache.misses == misses_after_first
    assert mgr.chunk_manager.cache.hits >= 11


def test_upload_failure_cleans_up(tmp_path):
    backend = FileSystemStorage(tmp_path / "store")
    mgr = TieredStorageManager(backend, chunk_size=CHUNK_SIZE)
    boom = RuntimeError("disk full")
    real_upload = backend.upload
    calls = []

    def failing_upload(key, data):
        calls.append(key)
        if len(calls) == 3:  # fail on the manifest (last object)
            raise boom
        return real_upload(key, data)

    backend.upload = failing_upload
    with pytest.raises(RuntimeError):
        mgr.copy_log_segment_data(META, SegmentData(SEGMENT_BYTES, dict(INDEXES)))
    assert backend.list_keys() == []  # orphans removed (W12)


def test_prefetch_warms_cache(tmp_path):
    backend = FileSystemStorage(tmp_path / "store")
    cache = MemoryChunkCache(1 << 22, prefetch_max_bytes=4 * CHUNK_SIZE)
    mgr = TieredStorageManager(backend, chunk_size=CHUNK_SIZE, cache=cache)
    mgr.copy_log_segment_data(META, SegmentData(SEGMENT_BYTES, dict(INDEXES)))
    b"".join(mgr.fetch_log_segment(META, 0, CHUNK_SIZE - 1))  # touches chunk 0
    import time

    deadline = time.monotonic() + 5
    want = {("t0-tid0/0/00000000000000001000-seg-uuid-1.log", i) for i in range(1, 5)}
    while time.monotonic() < deadline:
        if want <= set(cache._data.keys()):
            break
        time.sleep(0.05)
    assert want <= set(cache._data.keys())


class TestCustomMetadataSerde:
    """W13 broker-facing form: Kafka-protocol tagged fields
    (`SegmentCustomMetadataField.java:30-64` tag contract,
    `SegmentCustomMetadataSerde.java` wire format)."""

    def test_roundtrip_and_known_vectors(self):
        from tiered_storage_for_apache_kafka_spark.metadata_serde import (
            OBJECT_KEY,
            OBJECT_PREFIX,
            REMOTE_SIZE,
            deserialize_custom_metadata,
            serialize_custom_metadata,
        )

        fields = {REMOTE_SIZE: 126_000, OBJECT_PREFIX: "pfx/", OBJECT_KEY: "t-x/0/k.log"}
        data = serialize_custom_metadata(fields)
        assert deserialize_custom_metadata(data) == fields
        # empty map -> empty bytes (reference serialize contract)
        assert serialize_custom_metadata({}) == b""
        assert deserialize_custom_metadata(b"") == {}
        # hand-checked vector: 1 field, tag 0, VARLONG zigzag(5) = 10
        one = serialize_custom_metadata({REMOTE_SIZE: 5})
        assert one == bytes([1, 0, 1, 10])
        # compact string framing: uvarint(len+1) + utf8
        s = serialize_custom_metadata({OBJECT_PREFIX: "ab"})
        assert s == bytes([1, 1, 3, 3]) + b"ab"

    def test_rejections_and_forward_compat(self):
        import pytest

        from tiered_storage_for_apache_kafka_spark.metadata_serde import (
            REMOTE_SIZE,
            deserialize_custom_metadata,
            serialize_custom_metadata,
        )

        with pytest.raises(ValueError, match="unknown"):
            serialize_custom_metadata({9: "x"})
        with pytest.raises(ValueError, match="64-bit"):
            serialize_custom_metadata({REMOTE_SIZE: 2**63})
        with pytest.raises(ValueError, match="64-bit"):
            serialize_custom_metadata({REMOTE_SIZE: -(2**63) - 1})
        good = serialize_custom_metadata({REMOTE_SIZE: 7})
        with pytest.raises(ValueError, match="truncated"):
            deserialize_custom_metadata(good[:-1])
        with pytest.raises(ValueError, match="trailing"):
            deserialize_custom_metadata(good + b"\x00")
        # an unknown tag decodes to raw bytes (KIP-482 forward compat)
        unknown = bytes([1, 7, 2]) + b"\xaa\xbb"
        assert deserialize_custom_metadata(unknown) == {7: b"\xaa\xbb"}

    def test_copy_returns_broker_wire_bytes(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.api import (
            SegmentData,
            SegmentMetadata,
            TieredStorageManager,
        )
        from tiered_storage_for_apache_kafka_spark.metadata_serde import (
            OBJECT_KEY,
            OBJECT_PREFIX,
            REMOTE_SIZE,
            deserialize_custom_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
            FileSystemStorage,
        )

        mgr = TieredStorageManager(FileSystemStorage(tmp_path), chunk_size=64)
        meta = SegmentMetadata(
            topic="t", topic_id="tid", partition=0, start_offset=0,
            end_offset=9, segment_uuid="u-cm",
        )
        custom = mgr.copy_log_segment_data(
            meta,
            SegmentData(b"a" * 100, {
                "offset": b"o", "timestamp": b"t",
                "producerSnapshot": b"s", "leaderEpoch": b"e",
            }),
        )
        decoded = deserialize_custom_metadata(custom["custom_metadata"])
        assert decoded[REMOTE_SIZE] == custom["remote_size"]
        assert decoded[OBJECT_PREFIX] == ""
        assert decoded[OBJECT_KEY].endswith(".log")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    size=st.integers(0, 2**63 - 1),
    prefix=st.text(max_size=30),
    key=st.text(min_size=1, max_size=60),
)
def test_custom_metadata_roundtrip_property(size, prefix, key):
    from tiered_storage_for_apache_kafka_spark.metadata_serde import (
        OBJECT_KEY,
        OBJECT_PREFIX,
        REMOTE_SIZE,
        deserialize_custom_metadata,
        serialize_custom_metadata,
    )

    fields = {REMOTE_SIZE: size, OBJECT_PREFIX: prefix, OBJECT_KEY: key}
    assert deserialize_custom_metadata(serialize_custom_metadata(fields)) == fields


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(min_size=1, max_size=128))
def test_custom_metadata_never_crashes_on_garbage(blob):
    from tiered_storage_for_apache_kafka_spark.metadata_serde import (
        deserialize_custom_metadata,
    )

    try:
        deserialize_custom_metadata(blob)
    except ValueError:
        pass
