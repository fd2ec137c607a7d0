"""Similarity search over the embedding column.

`ann_cosine_topk` is the brute-force baseline: a broadcast of the (small)
query set against the full vector corpus — at 100 TB the corpus side stays
partitioned and never shuffles; each executor scores its shard and a
global top-k per query is taken (k*|Q| rows survive the final exchange).

All arithmetic is forced to DOUBLE on both engines (float32 paths differ
by ~1e-6 — enough to flip a 4-decimal rounding — double paths differ only
in ulps). Scores are output rounded to 4 decimals and ranking ties are
broken by vec_id, so Spark and the DuckDB oracle produce identical rows.

The LSH/IVF bucketed variant (scale path) is planned for a later round:
deterministic random-hyperplane signs via keyed md5, bucket join instead
of full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

N_QUERIES = 8
TOP_K = 5

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


@query(
    "ann_cosine_topk",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM vecs WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id, v.label AS neighbor_label,
         ROUND(list_dot_product(q.q_emb, v.emb)
               / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine_sim
  FROM q CROSS JOIN vecs v
  WHERE v.vec_id != q.query_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine_sim,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: queries broadcast against the corpus,
    dot products via zip_with/aggregate (JVM-side, no Python)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    # precompute norms ONCE per vector (map stage) instead of per pair —
    # cuts the pair-stage arithmetic to a single dot product
    norm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    q = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            norm.alias("q_norm"),
        )
    )
    v = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("emb"),
        norm.alias("v_norm"),
    )
    dot_qv = F.expr(_DOT.format(a="q_emb", b="emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(dot_qv / (F.col("q_norm") * F.col("v_norm")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine_sim", "rnk")
    )


N_PLANES = 8
DIM = 64


def _planes() -> list[list[int]]:
    """Deterministic random hyperplanes with {-1,+1} components, derived
    from md5 so Spark and the oracle share them as inline literals."""
    import hashlib

    planes = []
    for p in range(N_PLANES):
        row = []
        for i in range(DIM):
            h = hashlib.md5(f"plane:{p}:{i}".encode()).hexdigest()
            row.append(-1 if h[0] < "8" else 1)
        planes.append(row)
    return planes


_PLANES = _planes()


def _signature_spark() -> str:
    """SQL expr producing the LSH bucket signature of column `emb`."""
    bits = []
    for row in _PLANES:
        vals = ",".join(f"{v}.0D" for v in row)
        dot = (
            f"aggregate(zip_with(emb, array({vals}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def _signature_sql() -> str:
    bits = []
    for row in _PLANES:
        vals = ",".join(f"{v}.0" for v in row)
        dot = f"list_dot_product(emb, [{vals}])"
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


@query(
    "ann_lsh_bucketed",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), sigs AS (
  SELECT vec_id, emb, {_signature_sql()} AS bucket FROM vecs
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb, bucket FROM sigs WHERE vec_id < {N_QUERIES}
), cand AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.q_emb, s.emb)
               / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                  * sqrt(list_dot_product(s.emb, s.emb))), 4) AS cosine_sim
  FROM q JOIN sigs s ON s.bucket = q.bucket AND s.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
  FROM cand
) WHERE rnk <= {TOP_K}
""",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN *scale path*: random-hyperplane LSH bucketing — candidates
    are only same-bucket vectors, so the scoring join is
    |corpus|/2^planes per query instead of |corpus| (at 100 TB: bucket is
    the shuffle key; queries broadcast; no cross product)."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    norm = F.sqrt(F.expr(_DOT.format(a="emb", b="emb")))
    sigs = vecs.withColumn("bucket", F.expr(_signature_spark())).withColumn(
        "v_norm", norm
    )
    q = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("v_norm").alias("q_norm"),
            F.col("bucket"),
        )
    )
    dot_qv = F.expr(_DOT.format(a="q_emb", b="emb"))
    cand = (
        sigs.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot_qv / (F.col("q_norm") * F.col("v_norm")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


@query(
    "embedding_label_stats",
    oracle="""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(MIN(len(emb)) AS BIGINT) AS dim_min,
       CAST(MAX(len(emb)) AS BIGINT) AS dim_max,
       ROUND(MIN(sqrt(list_dot_product(emb, emb))), 4) AS min_norm,
       ROUND(MAX(sqrt(list_dot_product(emb, emb))), 4) AS max_norm
FROM vecs
GROUP BY label
""",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats (dimension sanity + norm envelope) — the
    monitoring aggregate of an embedding ingest pipeline."""
    vecs = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    return (
        vecs.select("label", F.size("embedding").alias("dim"), norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").cast("bigint").alias("dim_min"),
            F.max("dim").cast("bigint").alias("dim_max"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )
