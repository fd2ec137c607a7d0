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

from tiered_storage_for_apache_kafka_spark.operators.registry import (
    minor_units,
    minor_units_sql,
    query,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

SALT = 16
WINDOW_SEC = 24 * 3600  # interval width: 24 h after each purchase
BUCKET_SEC = 12 * 3600  # bucket width: each interval overlaps <= 3 buckets


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
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {minor_units_sql("SUM(CAST(value AS DECIMAL(18,4)))", 4)} AS total_value_e4
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
        minor_units(F.col("total_value"), 4).alias("total_value_e4"),
    )


@query(
    "range_join_purchase_window",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
  FROM events
), p AS (
  SELECT event_id AS purchase_id, user_id, sec AS start_sec
  FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, COUNT(e.event_id) AS n_follow_events
FROM p
JOIN ev e
  ON e.user_id = p.user_id
 AND e.sec >= p.start_sec
 AND e.sec <  p.start_sec + {WINDOW_SEC}
 AND e.event_id != p.purchase_id
GROUP BY p.purchase_id
""",
)
def range_join_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-on events within 24 h of each purchase, per purchase —
    executed as a *bucketed* range join: each interval explodes into the
    (<= 3) time buckets it overlaps, the join is equi on (user, bucket),
    and the BETWEEN is a residual within buckets. Timestamps quantized
    to whole seconds so both engines make identical boundary calls."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("sec").alias("start_sec"),
    )
    # each interval [start, start+W) overlaps a bounded set of buckets
    p_b = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_sec") / BUCKET_SEC),
                F.floor((F.col("start_sec") + WINDOW_SEC - 1) / BUCKET_SEC),
            )
        ),
    )
    e_b = ev.withColumn("bucket", F.floor(F.col("sec") / BUCKET_SEC))
    joined = p_b.join(e_b, ["user_id", "bucket"]).filter(
        (F.col("sec") >= F.col("start_sec"))
        & (F.col("sec") < F.col("start_sec") + WINDOW_SEC)
        & (F.col("event_id") != F.col("purchase_id"))
    )
    return joined.groupBy("purchase_id").agg(
        F.count("event_id").alias("n_follow_events")
    )
