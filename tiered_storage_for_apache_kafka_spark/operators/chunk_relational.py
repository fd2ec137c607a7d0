"""Relational renditions of the reference's dataflow operators.

The reference is a byte/stream engine; its operators (chunking, chunk-index
building, range→chunk planning, aux-index layout, batch grouping) are all
arithmetic over positions and sizes. Here each one is re-expressed as a
declarative DataFrame computation over the driver's test tables, which is
exactly how this engine computes its *metadata plane* (the `chunks` /
`manifests` tables of FIXTURES.md) at scale: window prefix-sums and
group-bys that Catalyst executes with map-side partial aggregation and a
single shuffle on the segment key.

Model: each `documents.source` value is one *segment*; each document is a
*record* of `n_chars` bytes appended in `doc_id` order; `CHUNK_SIZE` is the
fixed chunk size (reference default 4 MiB — scaled to 4 KiB for the test
tables, deliberately NOT aligned with record sizes, mirroring
`SingleBrokerTest.java:114-117`'s unaligned segments).

Reference parity (file:line cites into /root/reference):
- W1 chunking:          core/.../transform/BaseTransformChunkEnumeration.java:29-98
- W6 chunk-index build: core/.../transform/TransformFinisher.java:47-199,
                        manifest/index/AbstractChunkIndexBuilder.java
- R2 range planning:    manifest/index/AbstractChunkIndex.java:75-123,
                        fetch/FetchChunkEnumeration.java:54-92
- R7 trim-to-range:     fetch/FetchChunkEnumeration.java:100-138
- W8 aux-index layout:  core/.../KafkaRemoteStorageManager.java:296-360
- I11 batch grouping:   iceberg/RecordBatchGrouper.java:34-94

At 100 TB: everything below is one narrow window per segment (partitioned
by the segment key → no cross-segment shuffle beyond the hash partition on
`source`) followed by a partial-agg group-by. No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.local_df import (
    local_rows_df,
)
from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

CHUNK_SIZE = 4096


def _records_with_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (source, doc_id, n_chars, byte_pos) with byte_pos the
    running start position of each record within its segment (prefix sum,
    `AbstractChunkIndex.materializeChunks` analog)."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("byte_pos"),
    )


_POS_CTE = """
WITH pos AS (
  SELECT source, doc_id, n_chars,
         COALESCE(SUM(n_chars) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS byte_pos
  FROM documents
)
"""


@query(
    "chunk_index_fixed",
    oracle=_POS_CTE
    + f"""
SELECT source,
       CAST(FLOOR(byte_pos / {CHUNK_SIZE}.0) AS BIGINT) AS chunk_id,
       COUNT(*) AS record_count,
       CAST(SUM(n_chars) AS BIGINT) AS chunk_record_bytes,
       CAST(MIN(byte_pos) AS BIGINT) AS min_byte_pos,
       CAST(MAX(byte_pos) AS BIGINT) AS max_byte_pos
FROM pos
GROUP BY source, CAST(FLOOR(byte_pos / {CHUNK_SIZE}.0) AS BIGINT)
""",
)
def chunk_index_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W6 (fixed index): assign records to fixed-size chunks by start
    position; per-chunk stats. Mirrors FixedSizeChunkIndex arithmetic
    (`manifest/index/FixedSizeChunkIndex.java:45-122`)."""
    pos = _records_with_positions(spark, sf_dir)
    return (
        pos.withColumn(
            "chunk_id",
            F.floor(F.col("byte_pos") / F.lit(float(CHUNK_SIZE))).cast("bigint"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum("n_chars").cast("bigint").alias("chunk_record_bytes"),
            F.min("byte_pos").cast("bigint").alias("min_byte_pos"),
            F.max("byte_pos").cast("bigint").alias("max_byte_pos"),
        )
    )


@query(
    "chunk_index_variable",
    oracle=_POS_CTE
    + f"""
, chunks AS (
  SELECT source,
         CAST(FLOOR(byte_pos / {CHUNK_SIZE}.0) AS BIGINT) AS chunk_id,
         CAST(SUM(n_chars) AS BIGINT) AS original_size
  FROM pos GROUP BY 1, 2
), transformed AS (
  SELECT source, chunk_id, original_size,
         CAST(FLOOR(original_size * 0.6) + (chunk_id % 7) AS BIGINT) AS transformed_size
  FROM chunks
)
SELECT source, chunk_id, original_size, transformed_size,
       CAST(COALESCE(SUM(transformed_size) OVER (
           PARTITION BY source ORDER BY chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS transformed_position
FROM transformed
""",
)
def chunk_index_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 (variable index): per-chunk transformed sizes (deterministic
    compression model) → transformed positions as prefix sums — the
    VariableSizeChunkIndex invariant of FIXTURES.md §5 ("positions are
    prefix sums of sizes"; `VariableSizeChunkIndex.java:49-116`)."""
    pos = _records_with_positions(spark, sf_dir)
    chunks = (
        pos.withColumn(
            "chunk_id",
            F.floor(F.col("byte_pos") / F.lit(float(CHUNK_SIZE))).cast("bigint"),
        )
        .groupBy("source", "chunk_id")
        .agg(F.sum("n_chars").cast("bigint").alias("original_size"))
    )
    transformed = chunks.withColumn(
        "transformed_size",
        (F.floor(F.col("original_size") * 0.6) + (F.col("chunk_id") % 7)).cast("bigint"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return transformed.select(
        "source",
        "chunk_id",
        "original_size",
        "transformed_size",
        F.coalesce(F.sum("transformed_size").over(w), F.lit(0)).alias(
            "transformed_position"
        ),
    )


@query(
    "range_fetch_planning",
    oracle=_POS_CTE
    + f"""
, seg AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS segment_size FROM pos GROUP BY source
), frac AS (
  SELECT * FROM (VALUES (0, 0.00, 0.25), (1, 0.10, 0.50), (2, 0.25, 0.75),
                        (3, 0.50, 1.00), (4, 0.00, 1.00), (5, 0.99, 1.00))
       AS t(query_id, lo_frac, hi_frac)
), q AS (
  SELECT s.source, f.query_id,
         CAST(FLOOR(s.segment_size * f.lo_frac) AS BIGINT) AS start_pos,
         LEAST(CAST(FLOOR(s.segment_size * f.hi_frac) AS BIGINT),
               s.segment_size - 1) AS end_pos,
         s.segment_size
  FROM seg s CROSS JOIN frac f
)
SELECT source, query_id, start_pos, end_pos,
       CAST(FLOOR(start_pos / {CHUNK_SIZE}.0) AS BIGINT) AS start_chunk,
       CAST(FLOOR(end_pos / {CHUNK_SIZE}.0) AS BIGINT) AS last_chunk,
       CAST(FLOOR(end_pos / {CHUNK_SIZE}.0) AS BIGINT)
         - CAST(FLOOR(start_pos / {CHUNK_SIZE}.0) AS BIGINT) + 1 AS chunk_count,
       start_pos - CAST(FLOOR(start_pos / {CHUNK_SIZE}.0) AS BIGINT) * {CHUNK_SIZE} AS skip_bytes,
       end_pos - CAST(FLOOR(end_pos / {CHUNK_SIZE}.0) AS BIGINT) * {CHUNK_SIZE} + 1 AS last_chunk_keep_bytes
FROM q
""",
)
def range_fetch_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2+R7: translate a byte range into [startChunk..lastChunk] plus the
    first-chunk skip and last-chunk trim — the exact arithmetic of
    `AbstractChunkIndex.chunksForRange` (:113-123) and
    `FetchChunkEnumeration.java:100-138` (end clamped to segment_size-1 as
    in `RemoteStorageManager.java:141-144`)."""
    pos = _records_with_positions(spark, sf_dir)
    seg = pos.groupBy("source").agg(F.sum("n_chars").cast("bigint").alias("segment_size"))
    frac = local_rows_df(
        spark,
        [(0, 0.00, 0.25), (1, 0.10, 0.50), (2, 0.25, 0.75),
         (3, 0.50, 1.00), (4, 0.00, 1.00), (5, 0.99, 1.00)],
        "query_id INT, lo_frac DOUBLE, hi_frac DOUBLE",
    )
    q = seg.crossJoin(F.broadcast(frac)).select(
        "source",
        "query_id",
        F.floor(F.col("segment_size") * F.col("lo_frac")).cast("bigint").alias("start_pos"),
        F.least(
            F.floor(F.col("segment_size") * F.col("hi_frac")).cast("bigint"),
            F.col("segment_size") - 1,
        ).alias("end_pos"),
    )
    start_chunk = F.floor(F.col("start_pos") / F.lit(float(CHUNK_SIZE))).cast("bigint")
    last_chunk = F.floor(F.col("end_pos") / F.lit(float(CHUNK_SIZE))).cast("bigint")
    return q.select(
        "source",
        "query_id",
        "start_pos",
        "end_pos",
        start_chunk.alias("start_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - start_chunk + 1).alias("chunk_count"),
        (F.col("start_pos") - start_chunk * CHUNK_SIZE).alias("skip_bytes"),
        (F.col("end_pos") - last_chunk * CHUNK_SIZE + 1).alias("last_chunk_keep_bytes"),
    )


@query(
    "segment_offset_index",
    oracle=_POS_CTE
    + """
, seg AS (
  SELECT source, COUNT(*) AS record_count, CAST(SUM(n_chars) AS BIGINT) AS segment_size
  FROM pos GROUP BY source
), idx AS (
  SELECT * FROM (VALUES (0, 'OFFSET'), (1, 'TIMESTAMP'), (2, 'PRODUCER_SNAPSHOT'),
                        (3, 'LEADER_EPOCH'), (4, 'TRANSACTION'))
       AS t(index_type_id, index_type)
), sized AS (
  SELECT s.source, i.index_type_id, i.index_type,
         CAST(16 * s.record_count + 64 * (i.index_type_id + 1) AS BIGINT) AS index_size
  FROM seg s CROSS JOIN idx i
)
SELECT source, index_type_id, index_type, index_size,
       CAST(COALESCE(SUM(index_size) OVER (
           PARTITION BY source ORDER BY index_type_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
FROM sized
""",
)
def segment_offset_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: lay out the 5 Kafka aux indexes back-to-back inside one
    `.indexes` object — each index's position is the running sum of the
    previous sizes, ordered by index type (`KafkaRemoteStorageManager.
    java:296-360`, `SegmentIndexesV1Builder.java:27-64`). Index sizes here
    are a deterministic function of the segment's record count."""
    pos = _records_with_positions(spark, sf_dir)
    seg = pos.groupBy("source").agg(
        F.count(F.lit(1)).alias("record_count"),
        F.sum("n_chars").cast("bigint").alias("segment_size"),
    )
    idx = local_rows_df(
        spark,
        [(0, "OFFSET"), (1, "TIMESTAMP"), (2, "PRODUCER_SNAPSHOT"),
         (3, "LEADER_EPOCH"), (4, "TRANSACTION")],
        "index_type_id INT, index_type STRING",
    )
    sized = seg.crossJoin(F.broadcast(idx)).select(
        "source",
        "index_type_id",
        "index_type",
        (16 * F.col("record_count") + 64 * (F.col("index_type_id") + 1))
        .cast("bigint")
        .alias("index_size"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("index_type_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.select(
        "source",
        "index_type_id",
        "index_type",
        "index_size",
        F.coalesce(F.sum("index_size").over(w), F.lit(0)).alias("position"),
    )


@query(
    "manifest_summary",
    oracle=_POS_CTE
    + f"""
SELECT source,
       COUNT(*) AS record_count,
       CAST(SUM(n_chars) AS BIGINT) AS segment_size,
       CAST(CEIL((MAX(byte_pos) + MAX_BY(n_chars, byte_pos)) / {CHUNK_SIZE}.0) AS BIGINT)
         AS chunk_count,
       CAST(FLOOR(CAST(SUM(n_chars) AS BIGINT) / {CHUNK_SIZE}.0) AS BIGINT) * {CHUNK_SIZE}
         AS last_chunk_start,
       CAST(SUM(n_chars) - FLOOR(SUM(n_chars) / {CHUNK_SIZE}.0) * {CHUNK_SIZE} AS BIGINT)
         AS final_chunk_size
FROM pos
GROUP BY source
""",
)
def manifest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: one manifest row per segment — record/byte counts, chunk count
    = ceil(size/chunk), final partial-chunk size (the `finalTransformed
    ChunkSize` field of `FixedSizeChunkIndex.java`)."""
    pos = _records_with_positions(spark, sf_dir)
    size = F.sum("n_chars").cast("bigint")
    return pos.groupBy("source").agg(
        F.count(F.lit(1)).alias("record_count"),
        size.alias("segment_size"),
        F.ceil(
            (F.max("byte_pos") + F.max_by("n_chars", "byte_pos"))
            / F.lit(float(CHUNK_SIZE))
        )
        .cast("bigint")
        .alias("chunk_count"),
        (F.floor(size / F.lit(float(CHUNK_SIZE))).cast("bigint") * CHUNK_SIZE).alias(
            "last_chunk_start"
        ),
        (size - F.floor(size / F.lit(float(CHUNK_SIZE))) * CHUNK_SIZE)
        .cast("bigint")
        .alias("final_chunk_size"),
    )


@query(
    "batch_grouping",
    oracle="""
SELECT user_id,
       CAST(FLOOR(event_id / 100.0) AS BIGINT) AS batch_id,
       COUNT(*) AS record_count,
       MIN(event_id) AS base_offset,
       MAX(event_id) AS last_offset,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(25,4)) * 10000 AS BIGINT) AS batch_value_e4,
       CAST(MIN(CAST(ts AS DATE)) AS VARCHAR) AS first_day,
       CAST(MAX(CAST(ts AS DATE)) AS VARCHAR) AS last_day
FROM events
GROUP BY user_id, CAST(FLOOR(event_id / 100.0) AS BIGINT)
""",
)
def batch_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I11: group records into batches by batch identity and recover batch
    envelope stats (base/last offset, max timestamp) — the relational form
    of `RecordBatchGrouper.java:34-94` (identity :63-75), which groups
    consecutive rows by (batch_base_offset, producer_id, base_sequence).
    Here batch identity = (user_id, event_id div 100) over `events`."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "batch_id", F.floor(F.col("event_id") / F.lit(100.0)).cast("bigint")
        )
        .groupBy("user_id", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.min("event_id").alias("base_offset"),
            F.max("event_id").alias("last_offset"),
            (F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(25,4)") * 10000)
            .cast("bigint")
            .alias("batch_value_e4"),
            F.min(F.col("ts").cast("date")).cast("string").alias("first_day"),
            F.max(F.col("ts").cast("date")).cast("string").alias("last_day"),
        )
    )


@query(
    "offsets_for_times",
    oracle="""
WITH targets AS (
  SELECT * FROM (VALUES
    (TIMESTAMP '2024-01-08 00:00:00'),
    (TIMESTAMP '2024-01-15 00:00:00'),
    (TIMESTAMP '2024-01-22 00:00:00')) t(target_ts)
), ev AS (
  SELECT CAST(event_id % 4 AS INT) AS partition, event_id AS offset, ts
  FROM events
)
SELECT CAST(t.target_ts AS VARCHAR) AS target_ts, e.partition,
       MIN(e.offset) AS first_offset_at_or_after
FROM targets t
JOIN ev e ON e.ts >= t.target_ts
GROUP BY t.target_ts, e.partition
""",
)
def offsets_for_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka `offsetsForTimes` semantics over the tiered log: for each
    target timestamp, the earliest offset per partition whose record
    timestamp is at-or-after it — the query the TIMESTAMP aux index
    (R11, `SegmentIndexesV1`) answers. Relationally: a tiny broadcast of
    targets against the record plane, min-aggregated per (target,
    partition); at 100 TB the manifests table prunes to segments whose
    [min_ts, max_ts] window can contain the answer before any record is
    touched."""
    e = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        "ts",
    )
    # The theta-join (`ts >= target_ts`) form is a BroadcastNestedLoopJoin:
    # no codegen, every record row compared against every target and
    # multiplied by its matches. With a driver-side target list the same
    # answer is ONE codegen'd scan — a conditional MIN per target
    # (map-side partial agg, 4 groups/partition) — then an unpivot of the
    # per-partition aggregate row. At 100 TB this is the difference
    # between a full-log nested-loop and a single pruned pass.
    targets = ["2024-01-08 00:00:00", "2024-01-15 00:00:00", "2024-01-22 00:00:00"]
    per_part = e.groupBy("partition").agg(
        *[
            F.min(
                F.when(F.col("ts") >= F.lit(t).cast("timestamp"), F.col("offset"))
            ).alias(f"t{i}")
            for i, t in enumerate(targets)
        ]
    )
    stack_expr = "stack({n}, {args}) AS (target_ts, first_offset_at_or_after)".format(
        n=len(targets),
        args=", ".join(f"'{t}', t{i}" for i, t in enumerate(targets)),
    )
    return (
        per_part.select("partition", F.expr(stack_expr))
        .filter(F.col("first_offset_at_or_after").isNotNull())
        .select("target_ts", "partition", "first_offset_at_or_after")
    )
