"""Corpus-filtering stages: line-level exact dedup (CCNet's paragraph
dedup) and a hashed-n-gram linear quality classifier (the fastText-style
model filter of CCNet/DataTrove/Dolma pipelines).

Both are pure JVM-expression pipelines over the `documents` table — no
Python UDFs — and both carry DuckDB oracles, so the exact plan that runs
at 100 TB is the plan hash-verified here.

The synthetic corpus has no newline characters, so "lines" are fixed
``LINE_TOKENS``-token windows (documented stand-in: the segmentation is
one expression swap — ``split(text, '\\n')`` — when real lines exist;
everything downstream of segmentation is the production pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query

LINE_TOKENS = 12

# hashed-classifier geometry: 3 hex chars of a salted md5 -> 4096
# feature buckets (the fastText hashing trick at sandbox scale; the
# production layout is identical with a wider table)
QUALITY_BUCKETS = 4096
_WEIGHT_MULT = 2654435761  # Knuth multiplicative constant
_WEIGHT_MOD = 2001  # weights span [-1000, 1000]


def _lines_expr() -> str:
    """Non-overlapping LINE_TOKENS-token pseudo-lines of a ``toks``
    array column, as one JVM array expression (no shuffle, no UDF).
    ``greatest(..., 1)`` keeps a token-less doc as a single empty line
    on both engines (Spark's ``sequence(0, -1)`` would descend)."""
    n = f"greatest(int(ceil(size(toks)/{LINE_TOKENS}.0)), 1)"
    return (
        f"transform(sequence(0, {n} - 1), "
        f"g -> array_join(slice(toks, g*{LINE_TOKENS}+1, {LINE_TOKENS}), ' '))"
    )


@query(
    "dedup_lines_keep_first",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
), lines AS (
  SELECT doc_id, g AS line_no,
         array_to_string(l[(g*{LINE_TOKENS}+1):(g*{LINE_TOKENS}+{LINE_TOKENS})], ' ') AS line
  FROM (
    SELECT doc_id, l,
           unnest(generate_series(
             0, greatest(CAST(ceil(len(l)/{LINE_TOKENS}.0) AS INT), 1) - 1)) AS g
    FROM toks)
), marked AS (
  SELECT doc_id, line,
         row_number() OVER (
           PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rk
  FROM lines
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
       CAST(SUM(CASE WHEN rk = 1 THEN length(line) ELSE 0 END) AS BIGINT) AS kept_chars
FROM marked
GROUP BY doc_id
""",
)
def dedup_lines_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level exact dedup: every line is hashed, and
    only the FIRST occurrence corpus-wide (ordered by doc_id, line_no —
    deterministic) survives; the per-doc report shows how much of each
    document the pass retains. This is the sub-document complement of
    `dedup_exact` (whole docs) and `cdc_chunk_dedup_stats` (variable
    chunks): boilerplate that repeats across documents — headers,
    navigation, license blocks — is removed once per corpus, not once
    per document.

    Plan shape (the 100 TB plan): the shared cached token table feeds a
    narrow per-doc array expression that builds lines (no shuffle); one
    hash-partitioned shuffle keys lines by md5(line) for the keep-first
    window (state per key = the tiny dup group; in a real corpus the
    degenerate hot key is the empty line — segmentation drops it before
    the shuffle); one doc-keyed map-side-combined agg produces the
    report. Two shuffles total, nothing corpus-sized is ever broadcast
    or collected. CCNet shards this exact hash-keyed layout; reference
    has no analytics analog (this engine's LLM-pipeline extension).
    """
    from tiered_storage_for_apache_kafka_spark.operators.dedup import (
        tokens_cached,
    )

    lines = tokens_cached(spark, sf_dir).select(
        "doc_id",
        F.posexplode(F.expr(_lines_expr())).alias("line_no", "line"),
    )
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "line_no")
    marked = lines.withColumn("rk", F.row_number().over(w))
    kept = F.col("rk") == 1
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept_lines"),
        F.sum(F.when(kept, F.length("line")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


def _bucket_sql(tok: str) -> str:
    """DuckDB 0..4095 feature bucket: 3 hex chars of salted md5 via
    strpos arithmetic (bit-identical to the Spark twin)."""
    h = f"md5('q|' || {tok})"
    d = "'0123456789abcdef'"
    return (
        f"((strpos({d}, substr({h}, 1, 1)) - 1) * 256 + "
        f"(strpos({d}, substr({h}, 2, 1)) - 1) * 16 + "
        f"(strpos({d}, substr({h}, 3, 1)) - 1))"
    )


def _bucket_expr(tok: str) -> str:
    """Spark twin of :func:`_bucket_sql` (locate is 1-based too)."""
    h = f"md5(concat('q|', {tok}))"
    d = "'0123456789abcdef'"
    return (
        f"((locate(substr({h}, 1, 1), {d}) - 1) * 256 + "
        f"(locate(substr({h}, 2, 1), {d}) - 1) * 16 + "
        f"(locate(substr({h}, 3, 1), {d}) - 1))"
    )


@query(
    "quality_classifier_score",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
), feats AS (
  SELECT doc_id, tok FROM (SELECT doc_id, unnest(l) AS tok FROM toks)
  UNION ALL
  SELECT doc_id, pr[1] || '_' || pr[2] AS tok
  FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr
        FROM toks)
), hashed AS (
  SELECT doc_id, {_bucket_sql('tok')} AS bucket FROM feats
), weights AS (
  SELECT g AS bucket,
         (g * {_WEIGHT_MULT}) % {_WEIGHT_MOD} - {(_WEIGHT_MOD - 1) // 2} AS w
  FROM generate_series(0, {QUALITY_BUCKETS - 1}) t(g)
)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(weights.w) AS BIGINT) AS logit_sum,
       CAST(CASE WHEN SUM(weights.w) > 0 THEN 1 ELSE 0 END AS INT) AS keep_flag
FROM hashed h
JOIN weights USING (bucket)
GROUP BY h.doc_id
""",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier over hashed uni+bigram
    features — the model-based document filter (CCNet's LM-side
    classifier, DataTrove/Dolma's fastText quality gate). Features are
    hashed into QUALITY_BUCKETS buckets (the hashing trick: fixed
    model width regardless of vocabulary), each bucket carries a weight,
    and a document's logit is the sum of its feature weights.

    The weight table here is a deterministic pseudo-trained stand-in
    (multiplicative-hash values in [-1000, 1000], exact integers so the
    oracle matches bit-for-bit); in production the same table holds
    trained fastText weights — the serving plan is IDENTICAL: the model
    is a small (bucket, weight) dimension, broadcast to every executor,
    scoring is a broadcast hash join plus one doc-keyed map-side-combined
    agg. No shuffle touches the corpus except the final per-doc sum;
    no Python UDF anywhere; model width is independent of corpus size,
    so the plan survives 100 TB unchanged.
    """
    from tiered_storage_for_apache_kafka_spark.operators.dedup import (
        tokens_cached,
    )

    toks = tokens_cached(spark, sf_dir)
    unigrams = toks.select("doc_id", F.explode("toks").alias("tok"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            # size guard: for <2 tokens sequence(1, size-1) DESCENDS to
            # [1, 0] and toks[1] raises INVALID_ARRAY_INDEX under ANSI
            # mode (same hazard as pmi_bigram_collocations / _lines_expr)
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(toks[i - 1], '_', toks[i])) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("tok"),
    )
    hashed = unigrams.unionAll(bigrams).select(
        "doc_id", F.expr(_bucket_expr("tok")).cast("bigint").alias("bucket")
    )
    weights = spark.range(QUALITY_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * _WEIGHT_MULT) % _WEIGHT_MOD - (_WEIGHT_MOD - 1) // 2)
        .cast("bigint")
        .alias("w"),
    )
    scored = hashed.join(F.broadcast(weights), "bucket")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        F.sum("w").cast("bigint").alias("logit_sum"),
        F.when(F.sum("w") > 0, 1).otherwise(0).cast("int").alias("keep_flag"),
    )
