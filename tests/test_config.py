"""configure() facade — reference config-key parity
(`RemoteStorageManagerConfig.java:51-440`): same keys, defaults,
ranges, and validation messages."""

from __future__ import annotations

import pytest

from tiered_storage_for_apache_kafka_spark.api import SegmentData, SegmentMetadata
from tiered_storage_for_apache_kafka_spark.config import ConfigException, configure

META = SegmentMetadata(
    topic="t", topic_id="tid", partition=0, start_offset=0,
    end_offset=9, segment_uuid="cfg-seg",
)


def base(tmp_path, **extra):
    cfg = {
        "storage.backend.class": "filesystem",
        "storage.root": str(tmp_path / "store"),
        "chunk.size": "1024",
    }
    cfg.update(extra)
    return cfg


def test_minimal_config_round_trips(tmp_path):
    mgr = configure(base(tmp_path))
    mgr.copy_log_segment_data(
        META, SegmentData(b"x" * 5000, {"offset": b"O", "timestamp": b"T",
                                        "producerSnapshot": b"", "leaderEpoch": b""})
    )
    assert b"".join(mgr.fetch_log_segment(META, 0)) == b"x" * 5000
    assert mgr.chunk_size == 1024
    assert mgr.compression_enabled is False
    assert mgr.keyring is None
    assert mgr.chunk_manager.cache is None
    # index cache always wired (reference default 10 MiB)
    assert mgr._index_cache.max_bytes == 10 * 1024 * 1024


def test_required_keys():
    with pytest.raises(ConfigException, match="storage.backend.class"):
        configure({"chunk.size": "1024"})
    with pytest.raises(ConfigException, match="chunk.size"):
        configure({"storage.backend.class": "filesystem", "storage.root": "/tmp/x"})


def test_chunk_size_range(tmp_path):
    with pytest.raises(ConfigException, match="at least 1"):
        configure(base(tmp_path, **{"chunk.size": "0"}))
    with pytest.raises(ConfigException, match="at most"):
        configure(base(tmp_path, **{"chunk.size": str(1 << 31)}))


def test_compression_heuristic_requires_compression(tmp_path):
    # the reference's exact validation message (validateCompression)
    with pytest.raises(
        ConfigException,
        match="compression.enabled must be enabled if "
              "compression.heuristic.enabled is",
    ):
        configure(base(tmp_path, **{"compression.heuristic.enabled": "true"}))
    mgr = configure(base(
        tmp_path,
        **{"compression.enabled": "true",
           "compression.heuristic.enabled": "true"},
    ))
    assert mgr.compression_heuristic_enabled is True


def test_encryption_key_pairs(tmp_path):
    from tiered_storage_for_apache_kafka_spark.transform.encryption import (
        RsaKeyring,
    )

    ring = RsaKeyring.generate("kA")
    ring.add_kek("kB", __import__(
        "cryptography.hazmat.primitives.asymmetric.rsa",
        fromlist=["generate_private_key"],
    ).generate_private_key(65537, 2048), make_active=False)
    paths = {}
    for kid in ("kA", "kB"):
        p = tmp_path / f"{kid}.pem"
        p.write_bytes(ring.serialize_private(kid))
        paths[kid] = str(p)

    cfg = base(
        tmp_path,
        **{
            "encryption.enabled": "true",
            "encryption.key.pair.id": "kB",
            "encryption.key.pairs": "kA,kB",
            "encryption.key.pairs.kA.private.key.file": paths["kA"],
            "encryption.key.pairs.kB.private.key.file": paths["kB"],
        },
    )
    mgr = configure(cfg)
    assert mgr.keyring is not None
    assert mgr.keyring.active_kek_id == "kB"
    # rotation: old-KEK segments remain readable
    mgr.copy_log_segment_data(
        META, SegmentData(b"secret" * 100, {"offset": b"O", "timestamp": b"T",
                                            "producerSnapshot": b"",
                                            "leaderEpoch": b""})
    )
    assert b"".join(mgr.fetch_log_segment(META, 0)) == b"secret" * 100

    # active id not in the list: the reference's exact message
    bad = dict(cfg)
    bad["encryption.key.pair.id"] = "kZ"
    with pytest.raises(
        ConfigException, match="Encryption key 'kZ' must be provided"
    ):
        configure(bad)


def test_cache_configs(tmp_path):
    mgr = configure(base(
        tmp_path,
        **{
            "fetch.chunk.cache.class": "memory",
            "fetch.chunk.cache.size": "1048576",
            "fetch.chunk.cache.retention.ms": "-1",
            "fetch.chunk.cache.prefetch.max.size": "8192",
            "fetch.indexes.cache.size": "2048",
            "fetch.indexes.cache.retention.ms": "30000",
            "fetch.manifest.cache.size": "7",
            "fetch.manifest.cache.retention.ms": "60000",
        },
    ))
    cache = mgr.chunk_manager.cache
    assert cache.max_bytes == 1048576
    assert cache.retention_seconds is None  # -1 = infinite
    assert cache.prefetch_max_bytes == 8192
    assert mgr._index_cache.max_bytes == 2048
    assert mgr._index_cache.retention_seconds == 30.0
    assert mgr._manifest_cache_size == 7
    assert mgr._manifest_retention == 60.0

    disk = configure(base(
        tmp_path,
        **{
            "fetch.chunk.cache.class": "disk",
            "fetch.chunk.cache.path": str(tmp_path / "cache"),
        },
    ))
    from tiered_storage_for_apache_kafka_spark.fetch.cache import DiskChunkCache

    assert isinstance(disk.chunk_manager.cache, DiskChunkCache)
    with pytest.raises(ConfigException, match="fetch.chunk.cache.path"):
        configure(base(tmp_path, **{"fetch.chunk.cache.class": "disk"}))


def test_rate_limit_range(tmp_path):
    with pytest.raises(ConfigException, match="at least 1048576"):
        configure(base(
            tmp_path, **{"upload.rate.limit.bytes.per.second": "1000"}
        ))
    mgr = configure(base(
        tmp_path, **{"upload.rate.limit.bytes.per.second": "2097152"}
    ))
    assert mgr.rate_limiter is not None


def test_key_prefix_and_mask(tmp_path):
    mgr = configure(base(
        tmp_path, **{"key.prefix": "tier/", "key.prefix.mask": "true"}
    ))
    assert mgr.keys.prefix == "tier/"
    assert mgr.keys.mask_prefix is True
    # masking affects DISPLAY forms only; wire keys keep the real prefix
    key = mgr.keys.key("t", "tid", 0, 5, "u1", __import__(
        "tiered_storage_for_apache_kafka_spark.storage.object_key",
        fromlist=["Suffix"]).Suffix.LOG)
    assert key.startswith("tier/")
    assert mgr.keys.display(key) == "..." + key[len("tier/"):]
    unmasked = configure(base(tmp_path / "u", **{
        "storage.root": str(tmp_path / "u" / "store"), "key.prefix": "tier/"}))
    assert unmasked.keys.display(key) == key


def test_unknown_backend_rejected(tmp_path):
    with pytest.raises(ConfigException, match="unknown storage backend"):
        configure({"storage.backend.class": "bogus", "chunk.size": "8"})


def test_segment_format_validated(tmp_path):
    assert configure(base(tmp_path)).segment_format == "kafka"
    assert configure(
        base(tmp_path, **{"segment.format": "iceberg"})
    ).segment_format == "iceberg"
    with pytest.raises(ConfigException, match="segment.format"):
        configure(base(tmp_path, **{"segment.format": "orc"}))


def test_custom_metadata_fields_include(tmp_path):
    from tiered_storage_for_apache_kafka_spark.metadata_serde import (
        deserialize_custom_metadata,
    )

    data = SegmentData(b"p" * 100, {"offset": b"O", "timestamp": b"T",
                                    "producerSnapshot": b"", "leaderEpoch": b""})
    # reference default: EMPTY include list -> empty wire bytes
    mgr = configure(base(tmp_path))
    custom = mgr.copy_log_segment_data(META, data)
    assert custom["custom_metadata"] == b""

    # subset include
    mgr2 = configure(base(
        tmp_path / "b",
        **{"storage.root": str(tmp_path / "b" / "store"),
           "custom.metadata.fields.include": "REMOTE_SIZE,OBJECT_KEY"},
    ))
    custom = mgr2.copy_log_segment_data(META, data)
    fields = deserialize_custom_metadata(custom["custom_metadata"])
    assert set(fields) == {0, 2}  # REMOTE_SIZE, OBJECT_KEY tags
    assert fields[0] == custom["remote_size"]

    # unknown name rejected (as ConfigException, like every other key)
    with pytest.raises(ConfigException, match="custom.metadata.fields.include"):
        configure(base(
            tmp_path / "c",
            **{"storage.root": str(tmp_path / "c" / "store"),
               "custom.metadata.fields.include": "SHOE_SIZE"},
        ))


def test_structure_provider_wiring(tmp_path):
    from tiered_storage_for_apache_kafka_spark.avro import HttpSchemaRegistry

    cfg = base(tmp_path, **{
        "structure.provider.class": "avro-registry",
        "structure.provider.serde.schema.registry.url": "http://127.0.0.1:9",
    })
    mgr = configure(cfg)
    assert isinstance(mgr.structure_provider, HttpSchemaRegistry)

    with pytest.raises(ConfigException, match="schema.registry.url"):
        configure(base(
            tmp_path / "x",
            **{"storage.root": str(tmp_path / "x" / "s"),
               "structure.provider.class": "avro-registry"},
        ))
    with pytest.raises(ConfigException, match="structure.provider.class"):
        configure(base(
            tmp_path / "y",
            **{"storage.root": str(tmp_path / "y" / "s"),
               "structure.provider.class": "protobuf"},
        ))
    assert configure(base(
        tmp_path / "z", **{"storage.root": str(tmp_path / "z" / "s")}
    )).structure_provider is None


def test_metrics_configs(tmp_path):
    mgr = configure(base(tmp_path, **{
        "metrics.num.samples": "3",
        "metrics.sample.window.ms": "10000",
        "metrics.recording.level": "DEBUG",
    }))
    assert mgr.metrics.num_samples == 3
    assert mgr.metrics.sample_window_seconds == 10.0
    assert mgr.metrics.recording_level == "DEBUG"
    with pytest.raises(ConfigException, match="metrics.recording.level"):
        configure(base(tmp_path / "x", **{
            "storage.root": str(tmp_path / "x" / "s"),
            "metrics.recording.level": "LOUD",
        }))
