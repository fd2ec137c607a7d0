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
