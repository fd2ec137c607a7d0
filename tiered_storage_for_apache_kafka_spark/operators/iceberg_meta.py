"""Driver queries over the Iceberg metadata tables.

The reference's Iceberg mode delegates all table bookkeeping to the
Iceberg library + catalog (`IcebergTableManager.java:46-95`); its users
inspect that bookkeeping through the standard metadata tables
(`tbl.snapshots`, `tbl.files`, ...). These queries drive the engine's
own metadata-table layer (`sources/iceberg_meta_tables.py`) end-to-end
against tables committed by the engine's metadata plane, with DuckDB
oracles that rebuild the expected bookkeeping relationally from raw
`events` — equal hashes prove the *metadata* (not just the data)
describes exactly what was committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.operators.tiered import (
    BOUNDS_BAND,
    _ensure_banded_table,
    _iceberg_table,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
    files_table,
    partitions_table,
    snapshots_table,
)


@query(
    "iceberg_files_table",
    oracle="""
SELECT CAST(event_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS record_count,
       0 AS content,
       'PARQUET' AS file_format
FROM events
GROUP BY CAST(event_id % 4 AS INT)
""",
)
def iceberg_files_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`tbl.files` metadata table: live data files of the committed
    envelope table (one file per partition in this fixture), read
    executor-side from the manifest Avro — the oracle rebuilds the
    expected per-file record counts from raw `events`."""
    tdir, _rows = _iceberg_table(spark, sf_dir)
    return files_table(spark, tdir).select(
        F.col("partition").cast("int").alias("partition"),
        "record_count",
        "content",
        "file_format",
    )


@query(
    "iceberg_snapshots_table",
    oracle=f"""
WITH bands AS (
  SELECT event_id // {BOUNDS_BAND} AS band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT event_id % 4) AS BIGINT) AS n_files
  FROM events
  GROUP BY 1
)
SELECT CAST(band + 1 AS BIGINT) AS snapshot_seq,
       'append' AS operation,
       n_files AS added_files,
       n AS added_records,
       CAST(SUM(n) OVER (ORDER BY band) AS BIGINT) AS total_records
FROM bands
""",
)
def iceberg_snapshots_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`tbl.snapshots` metadata table over the banded table (one
    append per offset band): per snapshot, the operation plus the
    summary's added/total record counters. The oracle replays the
    band-by-band commit history relationally — equal hashes prove the
    snapshot chain and its running totals track every commit."""
    tdir = _ensure_banded_table(spark, sf_dir)
    snaps = snapshots_table(spark, tdir)
    return snaps.select(
        F.col("sequence_number").alias("snapshot_seq"),
        "operation",
        F.element_at("summary", "added-data-files")
        .cast("long")
        .alias("added_files"),
        F.element_at("summary", "added-records").cast("long").alias("added_records"),
        F.element_at("summary", "total-records").cast("long").alias("total_records"),
    )


@query(
    "iceberg_partitions_table",
    oracle="""
SELECT lang,
       SUBSTR(source, 1, 4) AS src4,
       CAST(COUNT(*) AS BIGINT) AS record_count,
       CAST(1 AS BIGINT) AS file_count
FROM documents
GROUP BY lang, SUBSTR(source, 1, 4)
""",
)
def iceberg_partitions_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`tbl.partitions` metadata table over a MULTI-FIELD STRING spec
    (identity(lang), truncate[4](source)): per-cell record/file rollup
    grouped by the full typed partition tuple — the skew/fragmentation
    view planners use, here proving the r8 typed-tuple grouping (a
    single-scalar rollup would fold every lang's prefix cells
    together). The oracle replays the cells relationally (identity and
    prefix-truncate are SQL-expressible; one file per cell by the
    writer's repartition construction)."""
    from tiered_storage_for_apache_kafka_spark.operators.iceberg_partitioning import (  # noqa: E501 (fixture shared with the scan query — built once per session)
        _string_partition_table,
    )

    tdir = _string_partition_table(spark, sf_dir)
    return partitions_table(spark, tdir).select(
        F.get_json_object("partition_json", "$.lang").alias("lang"),
        F.get_json_object("partition_json", "$.src4").alias("src4"),
        F.col("record_count").cast("long").alias("record_count"),
        F.col("file_count").cast("long").alias("file_count"),
    )
