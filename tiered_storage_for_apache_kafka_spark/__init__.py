"""tiered_storage_for_apache_kafka_spark — a PySpark-native analytics & tiered-storage engine.

A from-scratch, Spark-first re-expression of the capabilities of
``Aiven-Open/tiered-storage-for-apache-kafka`` (KIP-405 tiered storage:
chunked / compressed / encrypted segment upload, manifest + chunk-index
metadata, ranged fetch with pruning, Iceberg-style table mode), plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) required for 100 TB-scale training-data processing.

Layout
------
- ``storage``   — object-storage backends (filesystem, S3) + object-key scheme
- ``manifest``  — segment manifests, chunk indexes, delta codec, caches
- ``transform`` — write-path chunk pipeline: chunk → compress → encrypt
- ``fetch``     — read-path: range→chunk planning, ranged GET, detransform, cache
- ``operators`` — DataFrame operators: relational renditions of the reference's
  dataflow stages, TPC-H-style analytics, dedup/similarity/text/multimodal
- ``streaming`` — Structured Streaming ingest (segment commit via foreachBatch)
- ``api``       — the 5-method RemoteStorageManager facade
"""

__version__ = "0.1.0"
