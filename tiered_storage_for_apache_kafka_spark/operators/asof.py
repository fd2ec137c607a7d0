"""As-of join — an operator Spark lacks natively.

Implemented per the preference order for custom operators: the semantics
("latest order at-or-before each event, per customer") can't be a single
built-in op, so it is an Arrow-batched **cogrouped applyInPandas** using
`pd.merge_asof` per key group — events and orders are co-partitioned by
the key (one shuffle each), then each group is merged sorted-ly in one
pass. The DuckDB oracle states the same semantics relationally
(filtered-join + MAX), so the custom operator is hash-verified.

At 100 TB: the cogroup shuffle is on the join key; per-group state is
bounded by that key's rows; no cross-key data movement. Ties on the
as-of timestamp are collapsed by aggregating to MAX so the result is
deterministic regardless of intra-ts ordering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table


@query(
    "asof_latest_order_per_event",
    oracle="""
SELECT e.event_id, e.user_id,
       CAST(MAX(CAST(o.o_orderdate AS DATE)) AS DATE) AS last_order_day
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS DATE) <= CAST(e.ts AS DATE)
GROUP BY e.event_id, e.user_id
""",
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the most recent order day at-or-before the event
    day for the same customer (NULL when none)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("event_day")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )

    def merge(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        # merge_asof requires numeric/datetime keys: DATE arrives as
        # python date objects — promote to datetime64
        ev = ev.assign(event_day=pd.to_datetime(ev["event_day"])).sort_values(
            "event_day"
        ).reset_index(drop=True)
        if od.empty:
            out = ev.assign(last_order_day=pd.NaT)
        else:
            od = (
                pd.DataFrame({"last_order_day": pd.to_datetime(od["order_day"])})
                .drop_duplicates()  # tie-collapse: dates only
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
