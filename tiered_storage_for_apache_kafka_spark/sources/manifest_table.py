"""Manifests and chunks as DataFrames — the relational metadata plane.

The reference answers "which chunks for this byte range?" with arithmetic
inside one JVM (`AbstractChunkIndex.java:75-123`, cached manifests R1).
At 100 TB the same questions are answered relationally: a `manifests`
DataFrame (one row per segment, chunk sizes as a compact ARRAY column —
never persistently exploded, SURVEY.md §7.4.7) is broadcast-joined to
fetch requests, and chunk planning is a posexplode + window over the
requested segments only.

`plan_fetch_ranges` is the engine's distributed R2: given (segment,
byte-range) requests, emit the exact (chunk_id, transformed_position,
transformed_size, skip, take) plan — verified in tests to agree 1:1 with
the Python planner that executes the actual fetches.

`vacuum_expired_segments` is the R13 analog at scale: an offset-watermark
retention job that batch-deletes expired segments' objects from
executors (1000-key batches on S3), driver only sees counts.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.local_df import (
    local_rows_df,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import StorageBackend

MANIFEST_SCHEMA = (
    "object_key STRING, segment_uuid STRING, topic STRING, partition INT, "
    "start_offset BIGINT, end_offset BIGINT, compression BOOLEAN, "
    "encrypted BOOLEAN, index_type STRING, original_chunk_size BIGINT, "
    "original_file_size BIGINT, transformed_chunk_sizes ARRAY<BIGINT>, "
    "transformed_chunk_size BIGINT, final_transformed_chunk_size BIGINT"
)


def load_manifests_df(spark: SparkSession, backend_conf: dict) -> DataFrame:
    """Scan the store's `.rsm-manifest` objects into the manifests
    DataFrame. The listing happens once on the driver (keys only); JSON
    parsing is distributed."""
    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        _build_manager,
    )

    mgr = _build_manager(backend_conf)
    keys = [k for k in mgr.backend.list_keys() if k.endswith(".rsm-manifest")]
    keys_df = local_rows_df(
        spark,
        [(k,) for k in keys],
        "object_key STRING",
        slices=min(spark.sparkContext.defaultParallelism, max(len(keys), 1)),
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = _build_manager(backend_conf)
        for pdf in batches:
            rows = []
            for key in pdf["object_key"]:
                with m.backend.fetch(key) as f:
                    doc = json.loads(f.read())
                ci = doc["chunkIndex"]
                km = doc.get("kafkaMetadata", {})
                rows.append(
                    {
                        "object_key": key,
                        "segment_uuid": doc["segmentUuid"],
                        "topic": km.get("topic"),
                        "partition": km.get("partition"),
                        "start_offset": km.get("startOffset"),
                        "end_offset": km.get("endOffset"),
                        "compression": doc["compression"],
                        "encrypted": doc.get("encryption") is not None,
                        "index_type": ci["type"],
                        "original_chunk_size": ci["originalChunkSize"],
                        "original_file_size": ci["originalFileSize"],
                        "transformed_chunk_sizes": ci.get("transformedChunks"),
                        "transformed_chunk_size": ci.get("transformedChunkSize"),
                        "final_transformed_chunk_size": ci.get(
                            "finalTransformedChunkSize"
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return keys_df.repartition(max(1, min(len(keys), 32))).mapInPandas(
        parse, schema=MANIFEST_SCHEMA
    )


def chunks_df(manifests: DataFrame) -> DataFrame:
    """FIXTURES.md §5 `chunks` table, derived on demand (posexplode +
    window prefix sums) — only for the segments in `manifests`, which a
    caller filters FIRST (that filter is the R2 pruning)."""
    n_chunks = F.greatest(
        F.ceil(F.col("original_file_size") / F.col("original_chunk_size")), F.lit(1)
    ).cast("int")
    sizes_fixed = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.when(
            i < n_chunks - 1, F.col("transformed_chunk_size")
        ).otherwise(F.col("final_transformed_chunk_size")),
    )
    sizes = F.when(F.col("index_type") == "variable", F.col("transformed_chunk_sizes")).otherwise(
        sizes_fixed
    )
    exploded = manifests.select(
        "segment_uuid",
        "original_chunk_size",
        "original_file_size",
        F.posexplode(sizes).alias("id", "transformed_size"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("segment_uuid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    orig_pos = F.col("id") * F.col("original_chunk_size")
    return exploded.select(
        "segment_uuid",
        "id",
        orig_pos.alias("original_position"),
        F.least(
            F.col("original_chunk_size"), F.col("original_file_size") - orig_pos
        ).alias("original_size"),
        F.coalesce(F.sum("transformed_size").over(w), F.lit(0)).alias(
            "transformed_position"
        ),
        "transformed_size",
    )


def plan_fetch_ranges(manifests: DataFrame, requests: DataFrame) -> DataFrame:
    """R2+R7 relationally: requests (segment_uuid, start_pos, end_pos) ⋈
    chunks → per-chunk fetch plan with first-chunk skip / last-chunk take.

    The join prunes twice: broadcast the (small) request set against the
    manifests to pick segments, then intersect chunk windows — only
    chunks overlapping a request survive."""
    pruned = manifests.join(
        F.broadcast(requests.select("segment_uuid").distinct()), "segment_uuid"
    )
    chunks = chunks_df(pruned)
    r = requests.alias("r")
    c = chunks.alias("c")
    end = F.least(F.col("r.end_pos"), F.col("c.original_position") + F.col("c.original_size") - 1)
    joined = c.join(
        F.broadcast(r),
        (F.col("c.segment_uuid") == F.col("r.segment_uuid"))
        & (F.col("c.original_position") <= F.col("r.end_pos"))
        & (F.col("c.original_position") + F.col("c.original_size") > F.col("r.start_pos")),
    )
    skip = F.greatest(F.col("r.start_pos") - F.col("c.original_position"), F.lit(0))
    take = end - (F.col("c.original_position") + skip) + 1
    return joined.select(
        F.col("r.segment_uuid").alias("segment_uuid"),
        F.col("r.request_id").alias("request_id"),
        F.col("c.id").alias("chunk_id"),
        F.col("c.transformed_position").alias("transformed_position"),
        F.col("c.transformed_size").alias("transformed_size"),
        skip.cast("bigint").alias("skip_bytes"),
        take.cast("bigint").alias("take_bytes"),
    )


def vacuum_expired_segments(
    spark: SparkSession, manifests: DataFrame, backend_conf: dict, keep_offsets_from: int
) -> DataFrame:
    """Retention job (R13 at scale): delete all objects of segments whose
    end_offset < watermark; deletes run executor-side in key batches."""
    expired = manifests.filter(F.col("end_offset") < keep_offsets_from).select(
        "segment_uuid", "object_key"
    )

    def drop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            _build_manager,
        )

        m = _build_manager(backend_conf)
        for pdf in batches:
            deleted = []
            for key in pdf["object_key"]:
                base = key.removesuffix(".rsm-manifest")
                m.backend.delete([base + s for s in (".log", ".indexes", ".rsm-manifest")])
                deleted.append(key)
            yield pd.DataFrame({"object_key": deleted, "deleted": [True] * len(deleted)})

    return expired.select("object_key").mapInPandas(
        drop, schema="object_key STRING, deleted BOOLEAN"
    )
