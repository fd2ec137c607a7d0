"""Sketch-vs-exact audits for the two remaining approximate aggregates a
100 TB pipeline leans on: quantile sketches and HyperLogLog distincts.

Pattern (same as sq8_recall_at_k / minhash_jaccard_audit /
bloom_prefilter_audit): run the *approximate* operator Spark would use at
scale AND the exact computation, emit the exactly-checkable inventory
plus an integer pass flag; the DuckDB oracle reproduces the exact side
and pins the flag to 1 — so the driver hash-verifies that the sketch met
its accuracy contract on this data, not just that it ran.

HLL registers merge exactly commutatively, so its flag is stable across
runs and partitionings. GK quantile summaries are *near*-deterministic:
the compression step is not strictly merge-order independent, so the
quantile audit widens its rank tolerance to 2x the single-summary
guarantee (see in-function comment) rather than claiming bitwise
stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

PCTS = [50, 95, 99]
QUANTILE_ACC = 10_000  # approx_percentile accuracy: rank error <= n/acc
HLL_RSD = 0.02
HLL_TOL_PCT = 5  # pass if |approx - exact| <= 5% of exact (~2.5 sigma)


@query(
    "approx_quantile_audit",
    oracle=f"""
WITH per_type AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_values
  FROM events GROUP BY event_type
)
SELECT event_type, CAST(p.pct AS BIGINT) AS pct, n_values,
       CAST(1 AS BIGINT) AS rank_ok
FROM per_type
CROSS JOIN (VALUES {", ".join(f"({p})" for p in PCTS)}) AS p(pct)
""",
)
def approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (the GK-sketch path — the only percentile that
    works on 100 TB without a global sort) audited against its own rank
    guarantee: for each (event_type, p) the returned value's exact rank
    window [count(<v), count(<=v)] must overlap p*n within n/accuracy.

    Two passes over events (sketch, then rank-count against the
    broadcast thresholds), both map-side-combinable aggregations."""
    events = load_table(spark, sf_dir, "events")
    qs = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.percentile_approx(
            "value", [p / 100 for p in PCTS], QUANTILE_ACC
        ).alias("qs"),
    )
    j = events.select("event_type", "value").join(F.broadcast(qs), "event_type")
    aggs = []
    for i, _ in enumerate(PCTS):
        q = F.col("qs")[i]
        aggs.append(F.sum(F.when(F.col("value") < q, 1).otherwise(0)).alias(f"lo{i}"))
        aggs.append(F.sum(F.when(F.col("value") <= q, 1).otherwise(0)).alias(f"hi{i}"))
    ranks = j.groupBy("event_type", "n_values").agg(*aggs)
    # tol = 2*(n/accuracy) + 1: the single-summary GK guarantee is
    # n/accuracy, but Spark merges per-partition summaries and the
    # compression is not strictly merge-order independent — doubling the
    # slack absorbs the merge epsilon so the flag is stable across
    # partitionings (ADVICE r3); at accuracy 10k the widened tolerance is
    # still 0.02% of n, a meaningful audit
    rows = []
    for i, p in enumerate(PCTS):
        target = f"(n_values * {p} / 100.0)"
        tol = f"(2 * n_values / {QUANTILE_ACC} + 1)"
        ok = (
            f"CAST((lo{i} - {tol} <= {target}) AND ({target} <= hi{i} + {tol}) "
            "AS BIGINT)"
        )
        rows.append(f"({p}L, {ok})")
    stacked = ranks.select(
        "event_type",
        "n_values",
        F.expr(
            f"explode(array({', '.join(f'struct{r}' for r in rows)}))"
        ).alias("s"),
    )
    return stacked.select(
        "event_type",
        F.col("s.col1").alias("pct"),
        "n_values",
        F.col("s.col2").alias("rank_ok"),
    )


@query(
    "hll_distinct_audit",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(1 AS BIGINT) AS within_5pct
FROM events
GROUP BY event_type
""",
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, the mergeable fixed-size
    cardinality path at 100 TB) audited against exact COUNT DISTINCT:
    pass iff the estimate lands within {HLL_TOL_PCT}% of exact. The exact
    side is the expensive one (a distinct shuffle) — precisely what the
    sketch replaces in production; here it doubles as the oracle-checked
    ground truth."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact"),
        F.expr(
            f"cast(abs(approx_count_distinct(user_id, {HLL_RSD}) "
            f"- count(distinct user_id)) * 100 "
            f"<= count(distinct user_id) * {HLL_TOL_PCT} as bigint)"
        ).alias("within_5pct"),
    )


# -- KMV (theta-sketch) distinct set operations --------------------------------

KMV_K = 64  # sketch size; RSE ~ 1/sqrt(K-2) ~ 12.7%
_KMV_SPACE = 1 << 40  # hash domain: the 40-bit hex40 integer
_KMV_NUM = (KMV_K - 1) * _KMV_SPACE  # (k-1)/theta_frac numerator, exact in double


def _kmv_oracle() -> str:
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        _hex40_expr,
    )

    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        BIGRAM_LIST_SQL,
        BIGRAM_WORDS_SQL,
    )

    u = _hex40_expr("md5(tok)", "strpos")
    return f"""
WITH ws AS (
  SELECT lang, {BIGRAM_WORDS_SQL} AS w
  FROM documents WHERE lang IN ('en', 'de')
), tok AS (  -- word bigrams: the shingle domain the sketch estimates over
  SELECT DISTINCT lang, unnest({BIGRAM_LIST_SQL}) AS tok
  FROM ws
), u AS (
  SELECT DISTINCT lang, {u} AS u FROM tok
), rk AS (
  SELECT lang, u, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u) AS r,
         COUNT(*) OVER (PARTITION BY lang) AS n_u
  FROM u
), theta AS (  -- k-th smallest hash per set; full domain when n <= k
  SELECT lang,
         MAX(CASE WHEN n_u <= {KMV_K} THEN {_KMV_SPACE}
                  WHEN r = {KMV_K} THEN u END) AS theta,
         MAX(n_u) AS n_u
  FROM rk WHERE r <= {KMV_K} GROUP BY lang
), per_set AS (
  SELECT lang,
         CASE WHEN n_u <= {KMV_K} THEN n_u
              ELSE CAST(FLOOR({_KMV_NUM} / CAST(theta AS DOUBLE)) AS BIGINT)
         END AS n_estimate
  FROM theta
), sk AS (SELECT lang, u FROM rk WHERE r <= {KMV_K}),
union_rk AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS r,
         COUNT(*) OVER () AS n_u
  FROM (SELECT DISTINCT u FROM sk)
), union_est AS (
  -- exact only when strictly under K: a merged sketch holding exactly
  -- K hashes may be saturated while the true union is far larger
  SELECT CASE WHEN MAX(n_u) < {KMV_K} THEN MAX(n_u)
              ELSE CAST(FLOOR({_KMV_NUM} /
                   CAST(MAX(CASE WHEN r = {KMV_K} THEN u END) AS DOUBLE))
                   AS BIGINT)
         END AS n_estimate
  FROM union_rk WHERE r <= {KMV_K}
), min_theta AS (
  SELECT MIN(theta) AS th FROM theta
), inter_est AS (
  SELECT CAST(FLOOR(
           COUNT(*) * CAST({_KMV_SPACE} AS DOUBLE) / (SELECT th FROM min_theta)
         ) AS BIGINT) AS n_estimate
  FROM (SELECT u FROM sk WHERE lang = 'en'
        INTERSECT SELECT u FROM sk WHERE lang = 'de') c
  WHERE c.u < (SELECT th FROM min_theta)
), exact AS (
  SELECT 'en' AS set_name, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
  FROM tok WHERE lang = 'en'
  UNION ALL
  SELECT 'de', CAST(COUNT(DISTINCT tok) AS BIGINT) FROM tok WHERE lang = 'de'
  UNION ALL
  SELECT 'union', CAST(COUNT(DISTINCT tok) AS BIGINT) FROM tok
  UNION ALL
  SELECT 'intersect', CAST(COUNT(*) AS BIGINT) FROM
    (SELECT tok FROM tok WHERE lang = 'en'
     INTERSECT SELECT tok FROM tok WHERE lang = 'de') i
), est AS (
  SELECT lang AS set_name, n_estimate FROM per_set
  UNION ALL SELECT 'union', n_estimate FROM union_est
  UNION ALL SELECT 'intersect', n_estimate FROM inter_est
)
SELECT e.set_name, est.n_estimate, e.n_exact
FROM exact e JOIN est ON est.set_name = e.set_name
"""


@query("kmv_set_ops_audit", oracle=_kmv_oracle())
def kmv_set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch set algebra (Beyer et al. 2007; the DataSketches
    theta sketch): per-set distinct-count estimates from the K smallest
    hash values, plus UNION (k smallest of the merged sketches) and
    INTERSECTION (common hashes below min theta, scaled by 1/theta) —
    the mergeable way to answer "how many distinct tokens do these two
    corpora share" without ever shuffling full token sets together.
    Deterministic by construction (hash order statistics, no RNG), so
    the oracle recomputes the *estimates themselves*, not just a
    tolerance flag; the accuracy contract (RSE ~ 1/sqrt(K-2)) is pinned
    in pytest against the exact counts emitted alongside.

    Scale: each set's sketch is a per-partition top-K (Spark pushes a
    partial WindowGroupLimit below the exchange) over the deduped
    token stream — one shuffle keyed by the set id; sketch merge and
    intersection touch only K-row inputs. Exact counts (the audit's
    ground truth) are the expensive distinct aggregations the sketch
    replaces at 100 TB."""
    from pyspark.sql import Window

    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        _hex40_expr,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isin("en", "de")
    )
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        bigram_tokens,
    )

    # ONE corpus pass (guide §2.3/§2.4): the raw exploded bigram stream
    # goes straight into a groupBy(tok) with per-language membership
    # flags (partial aggregation dedupes map-side) — the separate
    # DISTINCT (lang, tok) pass and the second replay of the explode
    # for the exact-count side both collapse into this aggregate.
    by_tok = (
        bigram_tokens(docs, "lang")
        .groupBy("tok")
        .agg(
            F.max(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("in_en"),
            F.max(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("in_de"),
        )
    )
    # the sketch domain: DISTINCT (lang, u) — identical rows to the old
    # tok.distinct()→u.distinct() chain (flags are exactly membership)
    u = by_tok.select(
        F.explode(
            F.expr(
                "filter(array(CASE WHEN in_en = 1 THEN 'en' END, "
                "CASE WHEN in_de = 1 THEN 'de' END), x -> x IS NOT NULL)"
            )
        ).alias("lang"),
        F.expr(_hex40_expr("md5(tok)", "locate")).alias("u"),
    ).distinct()
    # n_u via a 2-row groupBy joined AFTER the rank filter: mixing an
    # unbounded count window into the row_number window would defeat
    # Spark's WindowGroupLimit pushdown (the partial top-K below the
    # exchange that keeps the sketch build O(K) per partition)
    counts = u.groupBy("lang").agg(F.count(F.lit(1)).alias("n_u"))
    w = Window.partitionBy("lang").orderBy("u")
    sk = (
        u.select("lang", "u", F.row_number().over(w).alias("r"))
        .where(F.col("r") <= KMV_K)
        .join(F.broadcast(counts), "lang")
        .cache()
    )
    theta = sk.groupBy("lang").agg(
        F.max(
            F.when(F.col("n_u") <= KMV_K, F.lit(_KMV_SPACE)).when(
                F.col("r") == KMV_K, F.col("u")
            )
        ).alias("theta"),
        F.max("n_u").alias("n_u"),
    )
    per_set = theta.select(
        F.col("lang").alias("set_name"),
        F.when(F.col("n_u") <= KMV_K, F.col("n_u"))
        .otherwise(
            F.floor(F.lit(float(_KMV_NUM)) / F.col("theta").cast("double"))
        )
        .cast("bigint")
        .alias("n_estimate"),
    )
    # one groupBy(u) over the (≤ 2K-row) sketch gives the merged-sketch
    # domain AND the per-set membership flags the intersection needs —
    # replacing a distinct plus an en/de self-join with a single tiny agg
    sku = sk.groupBy("u").agg(
        F.max(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("in_en"),
        F.max(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("in_de"),
    )
    union_rk = sku.select(
        "u",
        F.row_number().over(Window.orderBy("u")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_u"),
    ).where(F.col("r") <= KMV_K)
    union_est = union_rk.agg(
        # strict <: n_u == K can mean saturated sketches, not exactness
        F.when(F.max("n_u") < KMV_K, F.max("n_u"))
        .otherwise(
            F.floor(
                F.lit(float(_KMV_NUM))
                / F.max(F.when(F.col("r") == KMV_K, F.col("u"))).cast("double")
            )
        )
        .cast("bigint")
        .alias("n_estimate")
    ).select(F.lit("union").alias("set_name"), "n_estimate")
    min_theta = theta.agg(F.min("theta").alias("th"))
    common = (
        sku.where((F.col("in_en") == 1) & (F.col("in_de") == 1))
        .select("u")
        .crossJoin(F.broadcast(min_theta))
        .where(F.col("u") < F.col("th"))
    )
    inter_est = common.agg(
        F.floor(
            F.count(F.lit(1)) * F.lit(float(_KMV_SPACE)) / F.first("th")
        )
        .cast("bigint")
        .alias("n_estimate")
    ).select(F.lit("intersect").alias("set_name"), "n_estimate")
    est = per_set.unionByName(union_est).unionByName(inter_est)
    # the exact ground truth in ONE pass over the deduped token table
    # (guide §2.4): per-token membership flags, then a 1-row total —
    # |en|, |de|, |union| and |intersection| all fall out of the same
    # aggregation, replacing three separate distinct-aggregations and a
    # self-join (4 exchanges + a join became 2 exchanges; same BIGINT
    # counts since tok is already DISTINCT (lang, tok)). A lang with no
    # rows yields a 0-count row here where groupBy produced none — the
    # inner join with `est` (which has no estimate row for it either)
    # drops it identically.
    totals = by_tok.agg(
        F.sum("in_en").cast("bigint").alias("n_en"),
        F.sum("in_de").cast("bigint").alias("n_de"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.col("in_en") * F.col("in_de")).cast("bigint").alias("n_inter"),
    )
    exact = totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("en").alias("set_name"),
                    F.col("n_en").alias("n_exact"),
                ),
                F.struct(
                    F.lit("de").alias("set_name"),
                    F.col("n_de").alias("n_exact"),
                ),
                F.struct(
                    F.lit("union").alias("set_name"),
                    F.col("n_union").alias("n_exact"),
                ),
                F.struct(
                    F.lit("intersect").alias("set_name"),
                    F.col("n_inter").alias("n_exact"),
                ),
            )
        ).alias("s")
    ).select("s.set_name", "s.n_exact")
    return exact.join(est, "set_name").select(
        "set_name", "n_estimate", "n_exact"
    )
