"""Segment manifest: per-segment JSON metadata document.

Shape parity with ``manifest/SegmentManifestV1.java:30-132`` /
FIXTURES.md §4: chunk index, the 5 aux-index locations, compression
flag, encryption metadata (wrapped DEK + AAD), and Kafka segment
metadata. Stored as the ``.rsm-manifest`` object next to the segment;
at scale the same rows are appended to the `manifests` DataFrame so
fetch planning is a broadcast-join, not an object-store read storm.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field

from tiered_storage_for_apache_kafka_spark.manifest.chunk_index import (
    ChunkIndex,
    chunk_index_from_dict,
)

INDEX_TYPES = ["offset", "timestamp", "producerSnapshot", "leaderEpoch", "transaction"]
REQUIRED_INDEX_TYPES = INDEX_TYPES[:4]  # transaction optional (SegmentIndexesV1Builder.java:27-64)


@dataclass(frozen=True)
class IndexLocation:
    position: int
    size: int

    def to_dict(self) -> dict:
        return {"position": self.position, "size": self.size}


@dataclass(frozen=True)
class SegmentIndexes:
    """Locations of the 5 Kafka aux indexes inside the `.indexes` object."""

    locations: dict[str, IndexLocation]

    def __post_init__(self) -> None:
        missing = [t for t in REQUIRED_INDEX_TYPES if t not in self.locations]
        if missing:
            raise ValueError(f"missing required segment indexes: {missing}")
        unknown = [t for t in self.locations if t not in INDEX_TYPES]
        if unknown:
            raise ValueError(f"unknown segment index types: {unknown}")

    def to_dict(self) -> dict:
        return {t: loc.to_dict() for t, loc in self.locations.items()}

    @classmethod
    def from_dict(cls, d: dict) -> "SegmentIndexes":
        return cls({t: IndexLocation(**v) for t, v in d.items() if v is not None})


@dataclass(frozen=True)
class EncryptionMetadata:
    """Envelope-encryption metadata: ``dataKey`` is 'kekId:base64(rsa(dek))'
    (serde shape of `manifest/serde/DataKeySerializer.java:32-46`), ``aad``
    base64."""

    data_key: str
    aad: bytes

    def to_dict(self) -> dict:
        return {
            "dataKey": self.data_key,
            "aad": base64.b64encode(self.aad).decode("ascii"),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "EncryptionMetadata":
        return cls(data_key=d["dataKey"], aad=base64.b64decode(d["aad"]))


@dataclass(frozen=True)
class SegmentManifest:
    version = "1"
    segment_uuid: str
    chunk_index: ChunkIndex
    segment_indexes: SegmentIndexes
    compression: bool
    encryption: EncryptionMetadata | None = None
    kafka_metadata: dict = field(default_factory=dict)

    def to_json(self) -> str:
        doc = {
            "version": self.version,
            "segmentUuid": self.segment_uuid,
            "chunkIndex": self.chunk_index.to_dict(),
            "segmentIndexes": self.segment_indexes.to_dict(),
            "compression": self.compression,
            "encryption": self.encryption.to_dict() if self.encryption else None,
            "kafkaMetadata": self.kafka_metadata,
        }
        return json.dumps(doc, separators=(",", ":"), sort_keys=True)

    @classmethod
    def from_json(cls, s: str | bytes) -> "SegmentManifest":
        doc = json.loads(s)
        if doc.get("version") != "1":
            raise ValueError(f"unsupported manifest version {doc.get('version')!r}")
        return cls(
            segment_uuid=doc["segmentUuid"],
            chunk_index=chunk_index_from_dict(doc["chunkIndex"]),
            segment_indexes=SegmentIndexes.from_dict(doc["segmentIndexes"]),
            compression=doc["compression"],
            encryption=EncryptionMetadata.from_dict(doc["encryption"])
            if doc.get("encryption")
            else None,
            kafka_metadata=doc.get("kafkaMetadata", {}),
        )
