"""Content-defined chunking (CDC) dedup statistics.

The storage-side complement of the document dedup family: instead of
fixed-size chunks (the byte engine's W1, `transform/chunking.py`), CDC
places chunk boundaries where a rolling content hash hits a target
pattern — so an insertion early in a document only perturbs one chunk
boundary, and identical passages chunk identically across documents.
This is the dedup unit of backup/CAS systems (LBFS, restic, borg) and of
passage-level corpus dedup.

Token-level CDC here: a boundary closes after token *i* when the md5
bucket (0..255) of the 4-token window ending at *i* falls below 8 — an
expected chunk length of 32 tokens, fully deterministic and engine-
portable. Everything is JVM array expressions (sequence/filter/
transform/slice) — the only row-multiplying step is the final explode of
chunk hashes into the per-source distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table, scan_parallel

CDC_WINDOW = 4  # tokens in the rolling window
CDC_MASK = 8  # boundary when bucket < 8 of 256 → E[chunk] = 32 tokens


def _bucket(h: str) -> str:
    """0..255 from the first two hex nibbles (shared Spark/DuckDB form;
    locate == strpos positionally for these literals)."""
    return (
        f"(locate(substr({h}, 1, 1), '0123456789abcdef') - 1) * 16 + "
        f"(locate(substr({h}, 2, 1), '0123456789abcdef') - 1)"
    )


def _bucket_ddb(h: str) -> str:
    return (
        f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16 + "
        f"(strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


_W = CDC_WINDOW
_SPARK_GRAM = f"md5(array_join(slice(toks, i - {_W - 1}, {_W}), ' '))"
_DDB_GRAM = f"md5(array_to_string(t[i - {_W - 1}:i], ' '))"


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
                          AND {_bucket_ddb(_DDB_GRAM)} < {CDC_MASK}) AS bpos
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

    Scale: chunk boundaries and hashes are computed inside one map stage
    (array lambdas over the token array — no shuffle, no UDF); the only
    shuffle is the per-source distinct-count aggregation keyed by
    (source, chunk_hash), which partial-aggregates map-side."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "doc_id", "source", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    bounds = toks.select(
        "doc_id",
        "source",
        "toks",
        F.size("toks").alias("n"),
        # a boundary AT the final token would close an empty trailing
        # chunk — the last chunk ends there anyway, so exclude i = n
        F.expr(
            f"filter(sequence(1, size(toks)), "
            f"i -> i >= {_W} AND i < size(toks) AND {_bucket(_SPARK_GRAM)} < {CDC_MASK})"
        ).alias("bpos"),
    )
    chunked = bounds.select(
        "doc_id",
        "source",
        "toks",
        "n",
        F.expr("concat(array(1), transform(bpos, p -> p + 1))").alias("starts"),
        F.expr("concat(bpos, array(n))").alias("ends"),
    )
    hashes = chunked.select(
        "source",
        "n",
        F.expr(
            "transform(sequence(1, size(starts)), "
            "j -> md5(array_join(slice(toks, element_at(starts, j), "
            "element_at(ends, j) - element_at(starts, j) + 1), ' ')))"
        ).alias("chunk_hashes"),
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
