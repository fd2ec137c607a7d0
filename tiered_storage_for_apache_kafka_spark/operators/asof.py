"""As-of join — an operator Spark lacks natively.

Two implementations, both distributed on the join key:

- **asof_join_window** (the registered query's engine): union the two
  sides with a type tag, one shuffle+sort per key on (day, side), then
  `last(value, ignorenulls=True)` over an unbounded-preceding frame
  carries the most recent right-side value onto every left row. Entirely
  JVM-side (whole-stage codegen + a single window exchange) — this is
  the plan that survives 100 TB: shuffle once on the key, sort within
  partitions, no Python in the hot path, per-key state is one row.

- **asof_join_merge** (kept for generality): cogrouped
  `applyInPandas` running `pd.merge_asof` per key group — the shape to
  reach for when the as-of payload/semantics stop being expressible as
  a running window (e.g. nearest-within-tolerance both directions).

Ties on the as-of timestamp are collapsed to MAX so the result is
deterministic regardless of intra-ts ordering; at equal days the order
row sorts before the event row (inclusive `<=` semantics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_on: str,
    right_on: str,
    value: str,
) -> DataFrame:
    """Generic backward as-of join: for each left row, the latest
    right-side `value` with right_on <= left_on within `key`. Returns the
    left rows plus the carried value column (named `value`)."""
    l_tag = left.withColumn("_day", F.col(left_on)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_val", F.lit(None).cast(right.schema[value].dataType))
    r_tag = (
        right.select(
            key, F.col(right_on).alias("_day"), F.col(value).alias("_val")
        )
        .withColumn("_side", F.lit(0))
    )
    cols = [key, "_day", "_side", "_val"]
    extra = [c for c in left.columns if c not in (key,)]
    unioned = l_tag.select(*cols, *extra).unionByName(
        r_tag, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_day").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_carried", F.last("_val", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_day", "_side", "_val")
        .withColumnRenamed("_carried", value)
    )


@query(
    "asof_latest_order_per_event",
    oracle="""
SELECT e.event_id, e.user_id,
       CAST(CAST(MAX(CAST(o.o_orderdate AS DATE)) AS DATE) AS VARCHAR) AS last_order_day
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS DATE) <= CAST(e.ts AS DATE)
GROUP BY e.event_id, e.user_id
""",
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the most recent order day at-or-before the event
    day for the same customer (NULL when none). Window-based as-of plan:
    one shuffle on user_id, sort by (day, side), running last()."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("event_day")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("date").alias("last_order_day"),
    )
    joined = asof_join_window(
        events,
        orders,
        key="user_id",
        left_on="event_day",
        right_on="last_order_day",
        value="last_order_day",
    )
    # date → ISO string output: DATE materializes as datetime.date from
    # Spark but datetime64 from DuckDB→pandas — strings hash identically
    return joined.select(
        "event_id", "user_id", F.col("last_order_day").cast("string").alias("last_order_day")
    )


def asof_join_merge(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Cogrouped-`merge_asof` variant of the same semantics (events ⟕
    latest order at-or-before, per user). Arrow-batched; one cogroup
    shuffle on the key; per-group single-pass sorted merge."""

    def merge(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        ev = ev.assign(event_day=pd.to_datetime(ev["event_day"])).sort_values(
            "event_day"
        ).reset_index(drop=True)
        if od.empty:
            out = ev.assign(last_order_day=pd.NaT)
        else:
            od = (
                pd.DataFrame({"last_order_day": pd.to_datetime(od["order_day"])})
                .drop_duplicates()
                .sort_values("last_order_day")
                .reset_index(drop=True)
            )
            out = pd.merge_asof(
                ev,
                od,
                left_on="event_day",
                right_on="last_order_day",
                direction="backward",
            )
        out = out.assign(last_order_day=out["last_order_day"].dt.date)
        return out[["event_id", "user_id", "last_order_day"]]

    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            lambda ev, od: merge(ev, od),
            schema="event_id BIGINT, user_id BIGINT, last_order_day DATE",
        )
    )
