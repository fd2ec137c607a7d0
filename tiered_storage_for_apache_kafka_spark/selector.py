"""Dual-engine dispatch with format fallback.

Parity: `InternalRemoteStorageManagerSelector.java:67-99` — the
reference tries the configured format's RSM first and falls back to the
other when that format's manifest is missing, so mixed-format topics
(some segments tiered as raw bytes, some as table rows) stay readable
through one API.

Here the two engines are:

- **byte engine**: `TieredStorageManager` over the object store
  (manifest present ⇒ segment was tiered classic-mode);
- **table engine**: the envelope table (table-mode Parquet); a segment
  absent from the object store is reassembled **byte-exactly** from its
  rows via I11+I12 (`reassemble_batches` → `segment_bytes`).

The selector's contract mirrors the reference: primary engine first,
`KeyNotFoundError` (≈ missing manifest) triggers the fallback, and a
miss in both surfaces the original error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import KeyNotFoundError


class DualEngineFetcher:
    """fetch_segment(meta) -> bytes, trying byte engine then table engine
    (or the reverse, per `primary`)."""

    def __init__(
        self,
        byte_manager: TieredStorageManager,
        envelope: DataFrame | None = None,
        primary: str = "bytes",
    ):
        if primary not in ("bytes", "table"):
            raise ValueError("primary must be 'bytes' or 'table'")
        self.byte_manager = byte_manager
        self.envelope = envelope
        self.primary = primary

    # -- engines ---------------------------------------------------------------

    def _fetch_bytes(self, meta: SegmentMetadata) -> bytes:
        return b"".join(self.byte_manager.fetch_log_segment(meta, 0))

    def _fetch_table(self, meta: SegmentMetadata) -> bytes:
        if self.envelope is None:
            raise KeyNotFoundError(f"no table engine configured for {meta.segment_uuid}")
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            reassemble_batches,
            segment_bytes,
        )

        rows = self.envelope.filter(
            (F.col("kafka.segment_uuid") == meta.segment_uuid)
            & (F.col("kafka.partition") == meta.partition)
        )
        blobs = segment_bytes(reassemble_batches(rows)).collect()
        if not blobs:
            raise KeyNotFoundError(f"segment {meta.segment_uuid} not in table engine")
        return bytes(blobs[0].segment_blob)

    # -- dispatch (selector.call analog) ---------------------------------------

    def fetch_segment(self, meta: SegmentMetadata) -> bytes:
        engines = (
            (self._fetch_bytes, self._fetch_table)
            if self.primary == "bytes"
            else (self._fetch_table, self._fetch_bytes)
        )
        try:
            return engines[0](meta)
        except KeyNotFoundError as primary_miss:
            try:
                return engines[1](meta)
            except KeyNotFoundError:
                raise primary_miss
