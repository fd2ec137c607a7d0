"""Relational analytics operators over the driver's star schema.

The reference has no joins/aggregations (SURVEY.md §2.4) — but this engine
must *provide* them for the LLM-pipeline extensions, and they come from
Catalyst. These queries exercise the strategies that matter at 100 TB:

- `q1_pricing_summary`  — full-scan partial aggregation (map-side combine,
  one shuffle on a low-cardinality key);
- `q3_shipping_priority` — selective filters pushed to parquet + a
  broadcast of the filtered `customer` dim into the `orders⋈lineitem` join;
- `q5_local_supplier_volume` — a 6-table join where every dimension
  (region, nation, supplier, customer) is broadcast so the only shuffle is
  the big `orders⋈lineitem` co-partition;
- `top_events_per_user` — per-key top-k via ranked window (at scale: the
  shuffle is on user_id; AQE splits skewed users);
- `events_daily_kind`   — time-bucketed rollup of the event stream (the
  batch form of the streaming windowed agg in `streaming/`).

Money arithmetic is done in DECIMAL after an explicit cast so the DuckDB
oracle hashes identically (double SUMs differ in ulps across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import (
    minor_units,
    minor_units_sql,
    query,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

_PRICE = "decimal(18,2)"
_DISC = "decimal(12,4)"


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {minor_units_sql("SUM(CAST(l_quantity AS DECIMAL(18,2)))", 2)} AS sum_qty_e2,
       {minor_units_sql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))", 2)} AS sum_base_price_e2,
       {minor_units_sql('''SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))))''', 6)} AS sum_disc_price_e6,
       {minor_units_sql('''SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
                * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4))))''', 6)} AS sum_charge_e6,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with decimal-exact money math."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(_PRICE)
    one = F.lit(1).cast(_DISC)
    disc = F.col("l_discount").cast(_DISC)
    tax = F.col("l_tax").cast(_DISC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            minor_units(F.sum(F.col("l_quantity").cast(_PRICE)), 2).alias("sum_qty_e2"),
            minor_units(F.sum(price), 2).alias("sum_base_price_e2"),
            minor_units(F.sum(price * (one - disc)), 6).alias("sum_disc_price_e6"),
            minor_units(F.sum(price * (one - disc) * (one + tax)), 6).alias(
                "sum_charge_e6"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {minor_units_sql('''SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(12,4)) - CAST(l.l_discount AS DECIMAL(12,4))))''', 6)} AS revenue_e6,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered dims broadcast into the fact join.

    The `customer` side is explicitly broadcast — at 100 TB the filtered
    segment of a dimension still fits on every executor, turning the
    3-way join into one shuffle (orders⋈lineitem on orderkey)."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    price = F.col("l_extendedprice").cast(_PRICE)
    one = F.lit(1).cast(_DISC)
    disc = F.col("l_discount").cast(_DISC)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        )
        .agg(minor_units(F.sum(price * (one - disc)), 6).alias("revenue_e6"))
        .select("l_orderkey", "revenue_e6", "orderdate")
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {minor_units_sql('''SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(12,4)) - CAST(l.l_discount AS DECIMAL(12,4))))''', 6)} AS revenue_e6
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join; all dims broadcast, one fact shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast(_PRICE)
    one = F.lit(1).cast(_DISC)
    disc = F.col("l_discount").cast(_DISC)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(minor_units(F.sum(price * (one - disc)), 6).alias("revenue_e6"))
    )


@query(
    "top_events_per_user",
    oracle="""
SELECT user_id, event_id, event_type,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) WHERE rnk <= 3
""",
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k via ranked window; value itself is not output (float),
    the ordering is made deterministic with an event_id tiebreak."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        events.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "event_type", "rnk")
    )


@query(
    "events_daily_kind",
    oracle=f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {minor_units_sql("SUM(CAST(value AS DECIMAL(18,4)))", 4)} AS total_value_e4
FROM events
GROUP BY CAST(CAST(ts AS DATE) AS VARCHAR), event_type
""",
)
def events_daily_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup — the batch twin of the streaming windowed agg
    (`streaming/ingest.py`); at scale a two-level partial agg with a
    shuffle only on (day, event_type)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.col("ts").cast("date").cast("string").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            minor_units(F.sum(F.col("value").cast("decimal(18,4)")), 4).alias(
                "total_value_e4"
            ),
        )
    )
