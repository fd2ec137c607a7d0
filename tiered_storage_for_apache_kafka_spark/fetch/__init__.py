"""Read path: range→chunk planning, ranged GET, detransform, caching,
prefetch — the classic-mode fetch pipeline (SURVEY.md §2.2)."""

from tiered_storage_for_apache_kafka_spark.fetch.cache import (  # noqa: F401
    ChunkCache,
    DiskChunkCache,
    MemoryChunkCache,
)
from tiered_storage_for_apache_kafka_spark.fetch.chunk_manager import (  # noqa: F401
    ChunkManager,
)
