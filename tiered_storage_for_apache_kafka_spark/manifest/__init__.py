"""Segment manifests and chunk indexes — the engine's metadata plane.

At scale this metadata lives in a `manifests` DataFrame (one row per
segment, chunk sizes as a compact array column — never persistently
exploded, SURVEY.md §7.4.7); the classes here are the row model plus the
arithmetic that the relational operators in ``operators/chunk_relational``
express declaratively.
"""

from tiered_storage_for_apache_kafka_spark.manifest.chunk_index import (  # noqa: F401
    Chunk,
    ChunkIndex,
    FixedSizeChunkIndex,
    VariableSizeChunkIndex,
)
from tiered_storage_for_apache_kafka_spark.manifest.manifest import (  # noqa: F401
    EncryptionMetadata,
    IndexLocation,
    SegmentIndexes,
    SegmentManifest,
)
