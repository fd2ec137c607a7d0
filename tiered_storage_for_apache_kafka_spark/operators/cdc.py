"""Content-defined chunking (CDC) dedup statistics.

The storage-side complement of the document dedup family: instead of
fixed-size chunks (the byte engine's W1, `transform/chunking.py`), CDC
places chunk boundaries where a rolling content hash hits a target
pattern — so an insertion early in a document only perturbs one chunk
boundary, and identical passages chunk identically across documents.
This is the dedup unit of backup/CAS systems (LBFS, restic, borg) and of
passage-level corpus dedup.

Token-level CDC here: a boundary closes after token *i* when the md5 of
the 4-token window ending at *i* starts below hex '08' (bucket < 8 of
256 → expected chunk length 32 tokens) — deterministic and engine-
portable (ASCII compare in both engines).

PLAN NOTE (the expensive lesson): the boundary-position array MUST be
bound as a lambda variable (`transform(array(<bpos>), bp -> ...)`), not
a projected column. Catalyst's CollapseProject inlines a projected
column's expression into every consumer, so each `element_at(starts, j)`
inside the per-chunk transform would re-run the full O(n·md5) boundary
filter — turning the map stage O(n²·md5) per document (measured 90 s v.
0.8 s at sf0.1). With the lambda binding the filter runs once per row
and the whole chunker is a single fused JVM expression: no shuffle, no
UDF, no re-evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table, scan_parallel

CDC_WINDOW = 4  # tokens in the rolling window
CDC_HEX_UB = "08"  # boundary when md5 hex < '08' → 8/256 → E[chunk] = 32

_W = CDC_WINDOW

# boundary positions: i >= W (full window), i < n (a boundary at the last
# token would close an empty trailing chunk), md5 bucket below threshold
_SPARK_BPOS = (
    f"filter(sequence(1, size(toks)), i -> i >= {_W} AND i < size(toks) AND "
    f"substr(md5(array_join(slice(toks, i - {_W - 1}, {_W}), ' ')), 1, 2) < '{CDC_HEX_UB}')"
)

# chunk j spans [prev_boundary+1 .. boundary_j] (last chunk ends at n);
# bp is a lambda-bound array so the boundary filter evaluates ONCE per row
_SPARK_CHUNKS = (
    f"element_at(transform(array({_SPARK_BPOS}), bp -> "
    "transform(sequence(1, size(bp) + 1), j -> "
    "md5(array_join(slice(toks, "
    "if(j = 1, 1, element_at(bp, j - 1) + 1), "
    "if(j > size(bp), size(toks), element_at(bp, j)) "
    "- if(j = 1, 1, element_at(bp, j - 1) + 1) + 1), ' ')))), 1)"
)


@query(
    "cdc_chunk_dedup_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), bounds AS (
  SELECT doc_id, source, t, len(t) AS n,
         list_filter(generate_series(1, len(t)),
                     i -> i >= {_W} AND i < len(t)
                          AND substr(md5(array_to_string(t[i - {_W - 1}:i], ' ')), 1, 2)
                              < '{CDC_HEX_UB}') AS bpos
  FROM toks
), chunked AS (
  SELECT doc_id, source, t, n,
         list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
         list_append(bpos, n) AS ends
  FROM bounds
), hashes AS (
  SELECT doc_id, source, n,
         list_transform(generate_series(1, len(starts)),
                        j -> md5(array_to_string(t[starts[j]:ends[j]], ' ')))
           AS chunk_hashes
  FROM chunked
), per_source AS (
  SELECT source,
         CAST(SUM(len(chunk_hashes)) AS BIGINT) AS total_chunks,
         CAST(SUM(n) AS BIGINT) AS total_tokens
  FROM hashes GROUP BY source
), uniq AS (
  SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS distinct_chunks
  FROM (SELECT source, unnest(chunk_hashes) AS h FROM hashes)
  GROUP BY source
)
SELECT p.source, p.total_chunks, u.distinct_chunks, p.total_tokens,
       CAST((u.distinct_chunks * 1000000) // p.total_chunks AS BIGINT)
         AS unique_ratio_micro
FROM per_source p JOIN uniq u ON u.source = p.source
""",
)
def cdc_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source CDC dedup profile: total vs distinct content-defined
    chunks and the unique-chunk ratio — the measurement behind 'how much
    would passage-level dedup save on this source'.

    Scale: chunk boundaries and hashes are computed inside ONE fused map
    expression (see module PLAN NOTE — no shuffle, no UDF, boundary scan
    runs exactly once per document); the only shuffle is the per-source
    distinct-count aggregation keyed by (source, chunk_hash), which
    partial-aggregates map-side."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    # the token array is ALSO lambda-bound (outer transform) so the split
    # runs once per row however many times the chunker references it; the
    # single-element explode is a Generate node — a projection barrier, so
    # extracting n and chunk_hashes below does NOT re-inline the chunker
    # (CollapseProject stops at generators)
    hashes = docs.select(
        "source",
        F.explode(
            F.expr(
                "transform(array(split(trim(text), '\\\\s+')), "
                f"toks -> named_struct('n', size(toks), 'chunks', {_SPARK_CHUNKS}))"
            )
        ).alias("s"),
    ).select(
        "source",
        F.col("s.n").alias("n"),
        F.col("s.chunks").alias("chunk_hashes"),
    )
    per_source = hashes.groupBy("source").agg(
        F.sum(F.size("chunk_hashes")).cast("bigint").alias("total_chunks"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    )
    uniq = (
        hashes.select("source", F.explode("chunk_hashes").alias("h"))
        .groupBy("source")
        .agg(F.countDistinct("h").cast("bigint").alias("distinct_chunks"))
    )
    return (
        per_source.join(uniq, "source")
        .select(
            "source",
            "total_chunks",
            "distinct_chunks",
            "total_tokens",
            F.expr("cast(distinct_chunks * 1000000 div total_chunks as bigint)").alias(
                "unique_ratio_micro"
            ),
        )
    )
