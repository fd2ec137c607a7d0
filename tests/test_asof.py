"""The two as-of join implementations (JVM window plan vs cogrouped
pandas merge_asof) must produce identical results — the window plan is
the scale path, the merge plan the generality fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.asof import (
    asof_join_merge,
    asof_join_window,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_asof_window_matches_merge(spark):
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("event_day")
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )
    via_window = asof_join_window(
        events,
        orders.withColumnRenamed("order_day", "last_order_day"),
        key="user_id",
        left_on="event_day",
        right_on="last_order_day",
        value="last_order_day",
    ).select("event_id", "user_id", "last_order_day")
    via_merge = asof_join_merge(events, orders)

    rows_w = sorted(map(tuple, via_window.collect()))
    rows_m = sorted(map(tuple, via_merge.collect()))
    assert rows_w == rows_m
    assert len(rows_w) == events.count()
