"""R12 deadline semantics + schema evolution (SURVEY §7.4 hard parts 4/6)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentData,
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.fetch.chunk_manager import FetchTimeoutError
from tiered_storage_for_apache_kafka_spark.storage.filesystem import FileSystemStorage


class SlowBackend(FileSystemStorage):
    def __init__(self, root, delay: float):
        super().__init__(root)
        self.delay = delay

    def fetch(self, key, byte_range=None):
        if key.endswith(".log"):
            time.sleep(self.delay)
        return super().fetch(key, byte_range)


META = SegmentMetadata("t", "tid", 0, 0, 9, "u-slow")
INDEXES = {"offset": b"o", "timestamp": b"t", "producerSnapshot": b"p", "leaderEpoch": b"l"}


def test_fetch_deadline_raises_not_truncates(tmp_path):
    backend = SlowBackend(tmp_path, delay=0.15)
    mgr = TieredStorageManager(backend, chunk_size=1024)
    mgr.copy_log_segment_data(META, SegmentData(b"z" * 8192, dict(INDEXES)))
    # generous deadline: completes
    out = b"".join(mgr.fetch_log_segment(META, 0, 2047, deadline_seconds=30))
    assert out == b"z" * 2048
    # tight deadline: raises mid-stream (never silently returns short data)
    with pytest.raises(FetchTimeoutError):
        b"".join(mgr.fetch_log_segment(META, 0, None, deadline_seconds=0.2))


def test_no_deadline_unlimited(tmp_path):
    backend = SlowBackend(tmp_path, delay=0.01)
    mgr = TieredStorageManager(backend, chunk_size=1024)
    mgr.copy_log_segment_data(META, SegmentData(b"z" * 4096, dict(INDEXES)))
    assert len(b"".join(mgr.fetch_log_segment(META, 0))) == 4096


def test_table_mode_schema_evolution_add_column(spark, tmp_path):
    """The reference freezes the first record's schema (whitepaper
    'Current limitations'); our table mode evolves additively: later
    commits may add optional envelope-value fields and readers see a
    merged schema with NULLs for old files."""
    v1 = spark.range(5).select(
        F.col("id").alias("offset"), F.lit("a").alias("event_type")
    )
    v2 = spark.range(5, 10).select(
        F.col("id").alias("offset"),
        F.lit("b").alias("event_type"),
        F.lit(7).cast("bigint").alias("new_field"),
    )
    path = str(tmp_path / "evolving")
    v1.write.mode("append").parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "new_field" in merged.columns
    rows = {r["offset"]: r["new_field"] for r in merged.collect()}
    assert rows[0] is None and rows[9] == 7


def test_gated_backends_report_missing_sdk():
    from tiered_storage_for_apache_kafka_spark.storage.gcs_azure import (
        AzureBlobStorage,
        GcsStorage,
    )

    with pytest.raises(ImportError, match="google-cloud-storage"):
        GcsStorage("bucket")
    with pytest.raises(ImportError, match="azure-storage-blob"):
        AzureBlobStorage("container")
