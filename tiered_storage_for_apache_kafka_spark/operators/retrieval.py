"""Keyword retrieval over the documents table: BM25 top-k scoring.

The missing piece between the exact/fuzzy dedup family (content equality)
and the embedding ANN family (semantic similarity): lexical relevance
ranking, the op behind corpus search, hard-negative mining, and
retrieval-augmented filtering in training-data pipelines.

Scale design: the corpus side never materializes an all-terms inverted
index — tokens are filtered to the query's term set *inside the explode
stage* (predicate on the generator output, so the shuffle carries only
|terms|-matching postings). Document-length and corpus stats are
dimension-sized aggregates joined back via broadcast. The only shuffle
keyed by doc_id carries at most |query terms| rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.dedup import tokens_cached
from tiered_storage_for_apache_kafka_spark.operators.registry import query

K1 = 1.2
B = 0.75
B1 = 0.25  # 1 - B, pre-folded so both engines evaluate the same literal
TOP_N = 10
QUERY_TERMS = ["spark", "join", "window", "stream"]

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# identical arithmetic shape on both engines (same literals, same
# parenthesization → identical IEEE evaluation order); `ln` on doubles
# plus ROUND(4) output is the established portable pattern
# (unigram_logprob_quality, tfidf_top_terms)
_SCORE = (
    "SUM(ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
    "{tf} * {k1p1} / ({tf} + {k1} * ({b1} + {b} * {dl} / ({tot} / {n}))))"
)


def _score_sql(n: str, df: str, tf: str, dl: str, tot: str) -> str:
    return _SCORE.format(n=n, df=df, tf=tf, dl=dl, tot=tot, k1=K1, k1p1=K1 + 1, b1=B1, b=B)


@query(
    "bm25_topk_docs",
    oracle=f"""
WITH toks AS (
  -- string_split_regex mirrors Spark's split() exactly (including the
  -- [''] result for empty text), keeping dl/avgdl engine-identical
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), dl AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS total_dl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ({_TERMS_SQL})
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_matched_terms,
         {_score_sql("s.n_docs", "d.df", "tf.tf", "dl.dl", "s.total_dl")} AS score
  FROM tf
  JOIN df d USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, n_matched_terms, ROUND(score, 4) AS bm25_score,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOP_N}
""",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1={K1}, b={B}) top-{TOP_N} documents for a fixed keyword
    query. Postings are pruned to the query's terms before any shuffle;
    df/avgdl stats are broadcast; the final top-k is an orderBy+limit
    (TakeOrderedAndProject — no global window over the corpus)."""
    toks = tokens_cached(spark, sf_dir)
    dl = toks.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.sum("dl").cast("bigint").alias("total_dl"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    joined = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    scored = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_terms"),
        F.expr(_score_sql("n_docs", "df", "tf", "dl", "total_dl")).alias("score"),
    )
    top = (
        scored.orderBy(F.round(F.col("score"), 4).desc(), F.col("doc_id").asc())
        .limit(TOP_N)
        .withColumn("bm25_score", F.round("score", 4))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "n_matched_terms", "bm25_score", "rnk")
    )
