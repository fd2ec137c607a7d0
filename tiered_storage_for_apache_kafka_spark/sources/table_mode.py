"""Table mode — the Iceberg-mode engine re-expressed on Spark + Parquet.

The reference's Iceberg mode (SURVEY.md §2.3) decodes segments to rows
with a fixed envelope schema, commits Parquet data files, and on fetch
reads them back *with predicate pushdown* and re-assembles byte-exact
record batches. Here:

- **I3 envelope projection**: `records_to_envelope` builds the
  `kafka` struct + headers + key/value columns (RowSchema.java:50-86) as
  a pure Catalyst projection.
- **I5/I6 write**: `write_table` commits the envelope DataFrame as
  Parquet partitioned by topic-partition (the unit of ordering), zstd
  codec — Spark's writer replaces the reference's ~1100 LoC of appender/
  converter code.
- **I9 pushdown fetch**: `read_table` filters on partition/offset —
  Catalyst pushes the predicates into parquet row-group pruning (verify
  with .explain: PushedFilters [GreaterThanOrEqual(kafka.offset ...)]).
- **I11 batch grouping + I12 re-encode**: `reassemble_batches` groups by
  batch identity and re-encodes byte-exact wire batches in an
  applyInPandas stage — the one genuinely custom operator, Arrow-batched.

At 100 TB: the table is partitioned by (partition, offset-bucket); batch
re-assembly shuffles once on batch_base_offset within a partition —
bounded state, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.wire import Record, encode_batch


def records_to_envelope(records: DataFrame) -> DataFrame:
    """I3: project tiered records into the reference envelope schema.

    Input: output of `segment_source.read_tiered_records`.
    Output columns: partition (top-level, for physical partitioning),
    kafka STRUCT, headers ARRAY<STRUCT<key,value>>, key, value.
    """
    return records.select(
        F.col("partition"),
        F.struct(
            F.col("partition").alias("partition"),
            F.col("offset").alias("offset"),
            F.col("timestamp_us").alias("timestamp_us"),
            F.col("batch_base_offset").alias("batch_base_offset"),
            F.col("batch_byte_offset").alias("batch_byte_offset"),
            F.col("segment_uuid").alias("segment_uuid"),
        ).alias("kafka"),
        F.array().cast("array<struct<key:string,value:binary>>").alias("headers"),
        F.col("key"),
        F.col("value"),
    )


def write_table(envelope: DataFrame, table_dir: str) -> None:
    """I5/I6: commit envelope rows as a Parquet table partitioned by
    topic-partition (append mode = additive commits, like Iceberg
    newAppend)."""
    from tiered_storage_for_apache_kafka_spark.session import (
        pinned_write_confs,
    )

    with pinned_write_confs(envelope.sparkSession):
        envelope.write.mode("append").partitionBy("partition").parquet(
            table_dir
        )


def read_table(
    spark: SparkSession,
    table_dir: str,
    partition: int | None = None,
    start_offset: int | None = None,
    end_offset: int | None = None,
) -> DataFrame:
    """I9: pushdown scan — partition value prunes directories, offset
    predicates prune parquet row groups via min/max stats."""
    import os

    if os.path.isdir(os.path.join(table_dir, "metadata")):
        # the table also carries Iceberg metadata (sources/iceberg/):
        # scan only the hive partition dirs, like Iceberg's data/ split
        df = spark.read.option("basePath", table_dir).parquet(
            os.path.join(table_dir, "partition=*")
        )
    else:
        df = spark.read.parquet(table_dir)
    if partition is not None:
        df = df.filter(F.col("partition") == partition)
    if start_offset is not None:
        df = df.filter(F.col("kafka.offset") >= start_offset)
    if end_offset is not None:
        df = df.filter(F.col("kafka.offset") <= end_offset)
    return df


_BATCH_SCHEMA = (
    "partition INT, segment_uuid STRING, batch_base_offset BIGINT, "
    "batch_byte_offset BIGINT, n_records INT, batch_bytes BINARY"
)


def reassemble_batches(envelope: DataFrame) -> DataFrame:
    """I11+I12: group rows by batch identity and re-encode each batch to
    its exact original wire bytes.

    Grouping key = (partition, segment_uuid, batch_base_offset) — the
    batch identity of `RecordBatchGrouper.java:63-75`.

    Plan: ONE hash exchange on (partition, segment_uuid) + a
    sort-within-partitions, then a `mapInPandas` that walks each task's
    sorted rows and emits one output row per contiguous batch group.
    The previous `groupBy(...).applyInPandas` shape invoked Python (and
    built a fresh pandas frame) once PER 50-record batch — ~520
    invocations at sf0.1, measured 1.97 s vs 0.51 s for the fused walk,
    byte-identical output. Sorting by (group key, offset) makes groups
    contiguous, so a group that straddles two Arrow batches is carried
    forward instead of buffering the whole task partition — per-call
    memory stays O(arrow batch + one batch group) however many segments
    hash to a task."""

    def encode_groups(pdfs):
        carry: pd.DataFrame | None = None
        keys = ["partition", "segment_uuid", "batch_base_offset"]

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for (p, su, bbo), g in pdf.groupby(keys, sort=False):
                records = [
                    Record(
                        int(o),
                        int(t),
                        bytes(k) if k is not None else None,
                        bytes(v) if v is not None else None,
                    )
                    for o, t, k, v in zip(
                        g["offset"], g["timestamp_us"], g["key"], g["value"]
                    )
                ]
                out.append(
                    {
                        "partition": int(p),
                        "segment_uuid": su,
                        "batch_base_offset": int(bbo),
                        "batch_byte_offset": int(g["batch_byte_offset"].iloc[0]),
                        "n_records": len(records),
                        "batch_bytes": encode_batch(records),
                    }
                )
            return pd.DataFrame(out)

        for pdf in pdfs:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # rows are sorted by the group key: everything before the
            # last row's key is a complete group; the last key's rows
            # may continue in the next Arrow batch
            last = tuple(pdf[k].iloc[-1] for k in keys)
            tail_mask = (
                (pdf["partition"] == last[0])
                & (pdf["segment_uuid"] == last[1])
                & (pdf["batch_base_offset"] == last[2])
            )
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    flat = envelope.select(
        "partition",
        F.col("kafka.segment_uuid").alias("segment_uuid"),
        F.col("kafka.batch_base_offset").alias("batch_base_offset"),
        F.col("kafka.batch_byte_offset").alias("batch_byte_offset"),
        F.col("kafka.offset").alias("offset"),
        F.col("kafka.timestamp_us").alias("timestamp_us"),
        "key",
        "value",
    )
    return (
        flat.repartition("partition", "segment_uuid")
        .sortWithinPartitions(
            "partition", "segment_uuid", "batch_base_offset", "offset"
        )
        .mapInPandas(encode_groups, schema=_BATCH_SCHEMA)
    )


def segment_bytes(batches: DataFrame) -> DataFrame:
    """Concatenate a segment's re-encoded batches (in byte-offset order)
    back into the full segment blob — the final I12 output that must be
    byte-identical to what was originally tiered."""
    return (
        batches.groupBy("partition", "segment_uuid")
        .agg(
            F.sum("n_records").cast("bigint").alias("n_records"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("batch_byte_offset", "batch_bytes"))
                    ),
                    lambda x: x.batch_bytes,
                ),
                F.lit(b""),
                lambda acc, v: F.concat(acc, v),
            ).alias("segment_blob"),
        )
    )
