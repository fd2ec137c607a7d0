"""Skew-handling operators: salted aggregation and bucketed range join.

Two patterns every 100 TB pipeline eventually needs, expressed so the
result is oracle-exact while the *plan* carries the scale property:

- **salted aggregation**: a hot grouping key (one user producing 10% of
  all events) makes one reducer the straggler. Salting splits each key
  into SALT shards for the first (heavy) aggregation, then combines the
  shard partials — two small shuffles instead of one skewed one. The
  result is identical to the direct aggregation (SUM/COUNT are
  commutative monoids), which is exactly what the oracle checks.
  AQE's skewedJoin/coalesce handles *join* skew at runtime; salting is
  the aggregation-side counterpart that must be written into the plan.

- **bucketed range join**: `events.ts BETWEEN start AND end` against an
  interval table. The naive plan is a broadcast non-equi join that
  scores every (event, interval) pair. Bucketing quantizes time into
  fixed-width buckets, explodes each interval into the (bounded) set of
  buckets it overlaps, and joins on the *equi* bucket key first — the
  residual BETWEEN then filters within-bucket candidates only. The
  shuffle key is (key, bucket): uniform, bounded fanout, no cross
  product. This is the standard time-series range-join strategy
  (cf. Spark's range-join hints in Databricks runtime / Flink interval
  joins), built here from first principles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

SALT = 16
BUCKET_DAYS = 16
WINDOW_DAYS = 30


def salted_aggregate(
    df: DataFrame, key: str, salt_col: str, aggs: dict[str, str]
) -> DataFrame:
    """Two-phase salted aggregation: partial per (key, salt), final per
    key. `aggs` maps output column -> (sum|count) over an input column
    (monoid aggregates re-combine exactly)."""
    partials = []
    finals = []
    for out, spec in aggs.items():
        fn, col = spec.split(":")
        if fn == "count":
            partials.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        else:
            partials.append(F.sum(col).alias(f"_p_{out}"))
        finals.append(F.sum(f"_p_{out}").alias(out))
    salted = df.withColumn("_salt", (F.abs(F.hash(salt_col)) % SALT))
    return (
        salted.groupBy(key, "_salt")
        .agg(*partials)
        .groupBy(key)
        .agg(*finals)
    )


@query(
    "salted_user_activity",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_value
FROM events
GROUP BY user_id
""",
)
def salted_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals via salted two-phase aggregation — identical
    result to the direct groupBy (the oracle), but no single reducer
    ever sees a whole hot key."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "_v", F.col("value").cast("decimal(18,4)")
    )
    out = salted_aggregate(
        e, "user_id", "event_id", {"n_events": "count:", "total_value": "sum:_v"}
    )
    return out.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("decimal(38,4)").alias("total_value"),
    )


@query(
    "range_join_order_window",
    oracle=f"""
SELECT o.o_orderkey, COUNT(e.event_id) AS n_events_in_window
FROM orders o
JOIN events e
  ON e.user_id = o.o_custkey
 AND CAST(e.ts AS DATE) >= CAST(o.o_orderdate AS DATE)
 AND CAST(e.ts AS DATE) <  CAST(o.o_orderdate AS DATE) + INTERVAL {WINDOW_DAYS} DAY
GROUP BY o.o_orderkey
""",
)
def range_join_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events inside each order's {WINDOW_DAYS}-day window, per order —
    executed as a *bucketed* range join: intervals explode into the
    ceil(window/bucket)+1 time buckets they overlap, the join is equi on
    (user, bucket), and the BETWEEN is a residual within buckets."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "day_no"
        ),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("start_no"),
    )
    # each interval [start, start+W) overlaps a bounded set of buckets
    o_b = o.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_no") / BUCKET_DAYS),
                F.floor((F.col("start_no") + WINDOW_DAYS - 1) / BUCKET_DAYS),
            )
        ),
    )
    e_b = e.withColumn("bucket", F.floor(F.col("day_no") / BUCKET_DAYS))
    joined = o_b.join(e_b, ["user_id", "bucket"]).filter(
        (F.col("day_no") >= F.col("start_no"))
        & (F.col("day_no") < F.col("start_no") + WINDOW_DAYS)
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events_in_window")
    )
