"""Export-stage operators: the last mile of a training-data pipeline.

`per_source_quality_cap` is the per-domain document cap every web-scale
corpus applies before export (limit any one domain's share);
`export_shard_manifest` is the shard plan + integrity manifest a sharded
export (WebDataset/TFRecord-style) writes alongside the data files.
Both are pure integer outputs — no float portability surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

CAP_PER_SOURCE = 20
N_SHARDS = 16

# 60-bit integer from the first 15 hex chars of an md5 — identical in
# both engines (Spark `conv` base-16; DuckDB literal-power nibble sum)
_SPARK_H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
_DDB_H60 = "CAST(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5({{x}}), {i}, 1)) - 1) * {16 ** (15 - i)}"
    for i in range(1, 16)
) + " AS BIGINT)"


@query(
    "per_source_quality_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         LEN(regexp_extract_all(trim(text), '\\S+')) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS qrank
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN qrank <= {CAP_PER_SOURCE} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN qrank <= {CAP_PER_SOURCE} THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       MIN(CASE WHEN qrank = 1 THEN doc_id END) AS best_doc_id
FROM ranked
GROUP BY source
""",
)
def per_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) cap: keep the top {CAP_PER_SOURCE} documents
    per source by quality rank (n_chars desc, deterministic doc_id tie),
    report kept/total inventory per source.

    Scale: ONE shuffle on `source`; the rank is a window inside each
    source partition. Skewed mega-domains are exactly the case the cap
    exists for — the window still ranks within one partition, so for a
    domain too large for one task the production form pre-prunes with an
    approximate per-partition top-N before the global window (same
    two-phase shape as salted_user_activity)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.regexp_count(F.trim("text"), F.lit(r"\S+")).cast("bigint").alias("n_tokens"),
    ).withColumn("qrank", F.row_number().over(w))
    kept = F.col("qrank") <= CAP_PER_SOURCE
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.min(F.when(F.col("qrank") == 1, F.col("doc_id"))).alias("best_doc_id"),
    )


@query(
    "export_shard_manifest",
    oracle=f"""
WITH assigned AS (
  SELECT (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
           AS shard_id,
         doc_id,
         LEN(regexp_extract_all(trim(text), '\\S+')) AS n_tokens,
         {_DDB_H60.format(x="text")} AS content_h60
  FROM documents
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CAST(bit_xor(content_h60) AS BIGINT) AS content_fingerprint
FROM assigned
GROUP BY shard_id
""",
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard plan for a {N_SHARDS}-way hashed export: every document is
    assigned a shard by the first md5 nibble of its id (pure function of
    the id — re-runs and backfills land identically), and the manifest
    row per shard carries the inventory (docs, tokens, id range) plus an
    order-independent 60-bit XOR content fingerprint — the integrity
    check a resumed or re-run export compares before overwriting a shard.

    Scale: single map stage + one {N_SHARDS}-key aggregation; bit_xor is
    commutative so the aggregate is map-side partial. In a real export
    this DataFrame *is* the write plan: `df.repartition(shard_id).write`
    with the manifest committed after the data files."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        F.expr(
            "locate(substr(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef') - 1"
        ).alias("shard_id"),
        "doc_id",
        F.regexp_count(F.trim("text"), F.lit(r"\S+")).cast("bigint").alias("n_tokens"),
        F.expr(_SPARK_H60.format(x="text")).alias("content_h60"),
    )
    return assigned.groupBy(F.col("shard_id").cast("bigint").alias("shard_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.expr("cast(bit_xor(content_h60) as bigint)").alias("content_fingerprint"),
    )
