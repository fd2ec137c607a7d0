"""Gap-based sessionization — the batch twin of the streaming session
operator (`streaming/ingest.py` uses session_window / applyInPandasWithState).

Relational formulation: a session break is an event whose gap from the
previous event of the same user exceeds GAP; session ids are the running
count of breaks (lag + conditional cumulative sum — two stacked windows
over the same (user_id, ts) partitioning, one shuffle total).

Durations are output as integer seconds (epoch arithmetic — exact in both
engines), never as float intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

GAP_SECONDS = 6 * 3600


@query(
    "sessionize_events",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events
), ordered AS (
  SELECT user_id, event_id, ts_s,
         LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_ts_s
  FROM base
), flagged AS (
  SELECT user_id, event_id, ts_s,
         CASE WHEN prev_ts_s IS NULL OR ts_s - prev_ts_s > {GAP_SECONDS}
              THEN 1 ELSE 0 END AS is_break
  FROM ordered
), numbered AS (
  SELECT user_id, event_id, ts_s,
         SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       CAST(MAX(ts_s) - MIN(ts_s) AS BIGINT) AS duration_seconds
FROM numbered
GROUP BY user_id, session_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events per user with a 6h inactivity gap."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    # NOTE: unix_timestamp truncates to seconds; DuckDB epoch() does too
    # for the comparison values used here (gap threshold in whole seconds).
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = events.withColumn(
        "is_break",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | ((F.col("ts_s") - F.lag("ts_s").over(w)) > GAP_SECONDS),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_break")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
        (F.max("ts_s") - F.min("ts_s")).cast("bigint").alias("duration_seconds"),
    )


FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "funnel_conversion",
    oracle=f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' AND user_id IS NOT NULL
  GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE user_id IS NOT NULL)
            AS BIGINT) AS n_users,
       CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users progress view → click →
    purchase with each stage STRICTLY AFTER the previous one (first
    qualifying event per stage) — the product-analytics shape that needs
    per-user event-time ordering, not just counts per type.

    Plan: three per-user MIN aggregations, each gated by the previous
    stage's timestamp through an equi-join on user_id — all three aggs
    shuffle on the same key, so Spark reuses the hash partitioning
    across stages (no re-shuffle), and each stage's frame shrinks
    monotonically. No window over the full event stream, no
    explode — at 100 TB the funnel costs three user-keyed aggs over
    filtered scans."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    v = (
        events.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # one declarative plan (four 1-row aggregates cross-joined), not four
    # eager count() jobs
    return (
        events.agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users")
        )
        .crossJoin(v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed")))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_after"))
        )
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchased_after"))
        )
    )
