"""Trained k-means clustering over the embedding column, and the
IVF-with-trained-centroids ANN search built on top of it.

`ann_ivf_topk` (similarity.py) uses *hash-derived* cells — zero training
cost but cells ignore the data distribution. This module adds the real
thing: Lloyd's k-means (K=8, 3 iterations, deterministic farthest-first-
free init from the K lowest vec_ids) and an IVF index whose cells are the
trained centroids (the FAISS `IVFx` layout; see also embedding_int8_quantize
for the SQ8 compression stage that composes with it).

Scale design (the MLlib pattern): each Lloyd iteration is ONE distributed
pass — assignment is a pure JVM expression (literal centroid arrays folded
with `zip_with`/`aggregate`, no join, no shuffle), and the centroid update
is a map-side-combinable `posexplode → groupBy(cid, dim) → avg` whose
result is K×DIM rows. Only the K×DIM centroid table (512 values) ever
reaches the driver between rounds — exactly what `KMeans.fit` collects.
The corpus never shuffles during training; the only shuffle is the K·DIM-
key aggregation.

Cross-engine determinism: float32 embeddings are quantized once to
integer micro-units (`ROUND(x * 1e6)` as BIGINT); every distance is then
an exact BIGINT sum of squares and every centroid component an exact
integer division (`sum div count` / DuckDB `//`, both truncating) — no
float step anywhere, exact at any magnitude, so Spark and the DuckDB
oracle converge to bit-identical centroids and labels.
argmin ties break to the lowest cluster id via the `dist*K + cid` key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

K = 8
ITERS = 3
DIM = 64
Q_SCALE = 1_000_000
N_QUERIES = 8
NPROBE = 2
TOP_K = 5

# quantized-vector column expression (float32 -> exact integer micro-units;
# the DOUBLE hop matches DuckDB's CAST(x AS DOUBLE) exactly)
_QUANT = f"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT))"

# exact integer squared L2 distance between the quantized column `q` and a
# literal centroid array
def _dist_expr(centroid: list[int]) -> str:
    arr = "array(" + ", ".join(f"{v}L" for v in centroid) + ")"
    return (
        f"aggregate(zip_with(q, {arr}, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _argmin_key_expr(centroids: list[list[int]]) -> str:
    """least() over dist*K+cid keys — argmin with ties to the lowest cid,
    one whole-stage-codegen expression, no join."""
    keys = [f"({_dist_expr(c)} * {K} + {cid})" for cid, c in enumerate(centroids)]
    return "least(" + ", ".join(keys) + ")"


_CENTROID_CACHE: dict[str, list[list[int]]] = {}


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", F.expr(_QUANT).alias("q")
    )


def train_kmeans(spark: SparkSession, sf_dir: str) -> list[list[int]]:
    """Lloyd's k-means on quantized vectors; returns the final centroids
    as plain ints (cached per sf_dir — centroids are a pure function of
    the data, so the cache is session-independent)."""
    hit = _CENTROID_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    emb = _quantized(spark, sf_dir).select("vec_id", "q").cache()
    try:
        init = emb.orderBy("vec_id").limit(K).collect()
        centroids = [list(r["q"]) for r in init]
        for _ in range(ITERS):
            key = F.expr(_argmin_key_expr(centroids))
            assigned = emb.select((key % K).cast("bigint").alias("cid"), "q")
            means = (
                assigned.select("cid", F.posexplode("q").alias("dim", "val"))
                .groupBy("cid", "dim")
                .agg(
                    # integer division (`div`), NOT floor(sum/count): the
                    # double-division intermediate would only be exact
                    # below 2^53; div is exact at any magnitude and
                    # truncates identically in Spark and DuckDB (`//`)
                    F.expr("sum(val) div count(1)")
                    .cast("bigint")
                    .alias("comp")
                )
                .collect()
            )
            new = {}
            for r in means:
                new.setdefault(r["cid"], [0] * DIM)[r["dim"]] = r["comp"]
            # empty clusters keep their previous centroid (oracle does the same)
            centroids = [new.get(cid, centroids[cid]) for cid in range(K)]
    finally:
        emb.unpersist()
    _CENTROID_CACHE[sf_dir] = centroids
    return centroids


# ---------------------------------------------------------------- oracle SQL

_DDB_DIST = (
    "CAST(list_sum(list_transform(range(1, {dim1}), "
    "i -> (e.q[i] - c.c[i]) * (e.q[i] - c.c[i]))) AS BIGINT)"
).format(dim1=DIM + 1)


def _kmeans_cte() -> str:
    """The unrolled Lloyd iterations as a DuckDB CTE chain (c0 → c{ITERS}),
    ending with `afin` = final assignment + exact distance per vector."""
    parts = [
        f"""emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)) AS q
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, q AS c
  FROM (SELECT vec_id, q FROM emb ORDER BY vec_id LIMIT {K})
)""",
    ]
    for it in range(ITERS):
        parts.append(
            f"""a{it} AS (
  SELECT e.vec_id, e.q, arg_min(c.cid, {_DDB_DIST} * {K} + c.cid) AS cid
  FROM emb e CROSS JOIN c{it} c GROUP BY e.vec_id, e.q
)"""
        )
        parts.append(
            f"""m{it} AS (
  SELECT cid, list(comp ORDER BY dim) AS c
  FROM (SELECT a.cid, d.dim,
               CAST(CAST(SUM(a.q[d.dim]) AS BIGINT) // COUNT(*) AS BIGINT) AS comp
        FROM a{it} a CROSS JOIN range(1, {DIM + 1}) d(dim)
        GROUP BY a.cid, d.dim)
  GROUP BY cid
)"""
        )
        parts.append(
            f"""c{it + 1} AS (
  SELECT cid, c FROM m{it}
  UNION ALL
  SELECT cid, c FROM c{it} WHERE cid NOT IN (SELECT cid FROM m{it})
)"""
        )
    parts.append(
        f"""afin AS (
  SELECT e.vec_id, e.label,
         arg_min(c.cid, {_DDB_DIST} * {K} + c.cid) AS cid,
         MIN({_DDB_DIST}) AS dist
  FROM emb e CROSS JOIN c{ITERS} c GROUP BY e.vec_id, e.label
)"""
    )
    return ",\n".join(parts)


@query(
    "kmeans_embedding_clusters",
    oracle=f"""
WITH {_kmeans_cte()}
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(vec_id) AS rep_vec_id, CAST(SUM(dist) AS BIGINT) AS inertia_q
FROM afin GROUP BY cid
""",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile: size, lowest-id representative, and exact
    integer inertia per cluster after {ITERS} Lloyd rounds.

    inertia_q is the BIGINT sum of quantized squared distances (unit =
    micro-units²); max ~1e17 at this corpus — headroom to ~9e18. At 100 TB
    emit it per-cluster only (as here, never a global SUM) or step the
    quantization scale down.
    """
    centroids = train_kmeans(spark, sf_dir)
    key_sql = _argmin_key_expr(centroids)
    # `div`, not `/`: float division of the packed key is only exact below
    # 2^53 — integer division keeps the all-integer design cliff-free
    assigned = _quantized(spark, sf_dir).select(
        "vec_id",
        F.expr(f"({key_sql}) % {K}").cast("bigint").alias("cid"),
        F.expr(f"({key_sql}) div {K}").cast("bigint").alias("dist"),
    )
    return assigned.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("vec_id").alias("rep_vec_id"),
        F.sum("dist").cast("bigint").alias("inertia_q"),
    )


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


@query(
    "ann_ivf_kmeans_topk",
    oracle=f"""
WITH {_kmeans_cte()},
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DDB_DIST} * {K} + c.cid) AS prnk
    FROM emb e CROSS JOIN c{ITERS} c
    WHERE e.vec_id < {N_QUERIES}
  ) WHERE prnk <= {NPROBE}
),
vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS dv FROM embeddings
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, v.label AS neighbor_label,
         ROUND(list_dot_product(q.dv, v.dv)
               / (sqrt(list_dot_product(q.dv, q.dv))
                  * sqrt(list_dot_product(v.dv, v.dv))), 4) AS cosine_sim
  FROM probes p
  JOIN afin a ON a.cid = p.cid AND a.vec_id != p.query_id
  JOIN vecs v ON v.vec_id = a.vec_id
  JOIN vecs q ON q.vec_id = p.query_id
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
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with *trained* cells: corpus vectors live in their nearest
    k-means cell; each query probes its {NPROBE} nearest cells and scores
    exact double cosine inside them.

    Scale: the corpus is assigned with the same no-join literal-centroid
    expression as training, then shuffles ONCE on cell id; the probe table
    is |Q|*{NPROBE} rows and is broadcast. Per-query work is
    ~|corpus|*nprobe/K instead of |corpus|. Skew note: K={K} here for the
    oracle's sake — production uses K~sqrt(n) so a cell is ~sqrt(n) rows.
    """
    centroids = train_kmeans(spark, sf_dir)
    key = F.expr(_argmin_key_expr(centroids))
    quant = _quantized(spark, sf_dir)
    norm = F.sqrt(F.expr(_DOT.format(a="dv", b="dv")))
    corpus = quant.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dv"),
        (key % K).cast("bigint").alias("cid"),
    ).withColumn("v_norm", norm)

    # per-query nprobe nearest cells: sort the K keys, slice, decode cid
    keys_arr = "array(" + ", ".join(
        f"({_dist_expr(c)} * {K} + {cid})" for cid, c in enumerate(centroids)
    ) + ")"
    probe_cells = F.expr(
        f"transform(slice(array_sort({keys_arr}), 1, {NPROBE}), k -> k % {K})"
    )
    queries = (
        quant.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("q_dv"),
            probe_cells.alias("cells"),
        )
        .withColumn("q_norm", F.sqrt(F.expr(_DOT.format(a="q_dv", b="q_dv"))))
        .select("query_id", "q_dv", "q_norm", F.explode("cells").alias("cid"))
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(
                F.expr(_DOT.format(a="q_dv", b="dv"))
                / (F.col("q_norm") * F.col("v_norm")),
                4,
            ).alias("cosine_sim"),
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
