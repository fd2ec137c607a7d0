"""Loaders for the driver's synthetic test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

All loads go through ``spark.read.parquet`` so Catalyst gets pushdown,
pruning, and vectorized decoding; no schema is imposed (parquet carries it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp-ish column to TIMESTAMP (with session TZ),
    dtype-agnostically. The driver has regenerated events.parquet with
    different physical types across rounds — TIMESTAMP(NANOS) (arrives
    as BIGINT ns under nanosAsLong), then TIMESTAMP(MICROS) without UTC
    adjustment (arrives as TIMESTAMP_NTZ) — so operators must never
    assume the on-disk flavor. Session TZ is UTC, so the NTZ→TZ cast is
    value-preserving."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):  # TIMESTAMP(NANOS) read as raw ns
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# (applicationId, sf_dir, name) -> DataFrame. A DataFrame is an
# immutable plan handle, so handing every caller the same object is
# safe; rebuilding it per call paid a ~60 ms py4j + footer-inference
# round-trip, which across a ~200-query bench pass (1-3 load_table
# calls each, two passes) added tens of seconds of pure driver-side
# re-listing of the same immutable files. Entries of dead sessions are
# evicted on insert (same policy as the operator-level caches).
_LOAD_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # Some testdata generations write events.ts as TIMESTAMP(NANOS),
        # which Spark rejects unless nanosAsLong is set. Callers may pass
        # their own SparkSession (the correctness driver does), so set it
        # here at runtime — it is a runtime-settable SQL conf.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked down — fall through and let the read report it
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_ts(df)
    for stale in [k for k in _LOAD_CACHE if k[0] != key[0]]:
        del _LOAD_CACHE[stale]
    _LOAD_CACHE[key] = df
    return df


def scan_parallel(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a narrow, expensive map stage across all cores.

    Spark splits parquet files into byte-range tasks, but a task only
    produces rows if its range contains a row-group start — a one-row-
    group file runs the whole pre-shuffle map (tokenize/explode/regexp)
    on ONE core no matter how many splits the planner reports. So the
    partition count lies; count actual row groups in the scan's input
    files instead. Repartition round-robin only when row groups < slots —
    at 100 TB the table is thousands of files/row-groups and this is a
    no-op (a blind repartition there would shuffle the entire table).

    Call it directly on the `load_table` result (the raw scan), before
    any transformation.
    """
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) >= target:  # plenty of natural splits (the 100 TB case)
        return df
    import pyarrow.parquet as pq

    try:
        n_rg = sum(
            pq.ParquetFile(f.removeprefix("file://")).num_row_groups
            for f in files
        )
    except Exception:  # non-local / non-parquet input: trust the planner
        return df
    if n_rg < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql access paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
