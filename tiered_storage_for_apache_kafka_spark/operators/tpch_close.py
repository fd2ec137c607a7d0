"""The last four TPC-H shapes (Q2, Q12, Q20, Q21) — closing out the full
22-query suite.

The driver's star schema has no partsupp table and no
commit/receipt-date or shipmode columns, so each query keeps its classic
*plan shape* on the columns that exist (the same adaptation policy as
`tpch_extra.py`):

- q2  — correlated per-part MIN subquery, decorrelated to agg +
        join-back, over region-filtered (broadcast) supplier dims;
- q12 — fact-fact join with conditional priority counts per derived
        shipping-delay bucket (the shipmode stand-in);
- q20 — two-level nested IN subqueries as a semi-join chain
        (LIKE-filtered parts → shipped-quantity HAVING → suppliers);
- q21 — the EXISTS / NOT EXISTS self-join on lineitem, decorrelated
        into one per-order aggregate (distinct suppliers vs distinct
        *late* suppliers) — one shuffle instead of two self-joins.

All dates in the testdata are midnight-aligned timestamps, so day
arithmetic (`datediff`, `+ INTERVAL 90 DAY`) agrees between engines.
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

Q2_REGION = "EUROPE"
Q12_SLOW_DAYS = 60
Q12_MEDIUM_DAYS = 21
Q20_NAME_PREFIX = "small"
Q20_MIN_QTY = 50
Q21_LATE_DAYS = 90


@query(
    "q2_min_cost_supplier",
    oracle=f"""
WITH regional_supplier AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q2_REGION}'
), offer AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS best_price
  FROM lineitem l
  JOIN regional_supplier rs ON rs.s_suppkey = l.l_suppkey
  GROUP BY l.l_partkey, l.l_suppkey
), part_min AS (
  SELECT l_partkey, MIN(best_price) AS min_price FROM offer GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, rs.s_name, rs.n_name AS nation,
       {minor_units_sql("rs.s_acctbal", 2)} AS s_acctbal_e2,
       {minor_units_sql("o.best_price", 2)} AS min_price_e2
FROM offer o
JOIN part_min m ON o.l_partkey = m.l_partkey AND o.best_price = m.min_price
JOIN regional_supplier rs ON rs.s_suppkey = o.l_suppkey
JOIN part p ON p.p_partkey = o.l_partkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated "supplier with the minimum cost for
    this part in this region" subquery, decorrelated the way Catalyst
    plans it — aggregate per (part, supplier), re-aggregate per part, and
    join the per-part minimum back (keeping ties, as Q2 does). The
    supplier→nation→region dimension chain is broadcast; the only fact
    shuffle is the (part, supplier) aggregation.

    Without partsupp, the observed minimum line price stands in for
    ps_supplycost (same plan, different column). Parity:
    reference has no relational engine; shape follows TPC-H spec Q2.

    The per-part minimum attaches as a window MIN over the (part,
    supplier) aggregates instead of re-aggregating and joining back —
    exact decimal compare keeps ties identically, and lineitem is
    scanned once instead of twice.
    """
    from pyspark.sql.window import Window
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    rs = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_extendedprice").cast(_PRICE).alias("price")
    )
    offer = (
        li.join(F.broadcast(rs.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price").alias("best_price"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    best = offer.withColumn(
        "min_price", F.min("best_price").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("best_price") == F.col("min_price"))
    return (
        best.join(F.broadcast(rs), best.l_suppkey == rs.s_suppkey)
        .join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            minor_units(F.col("s_acctbal"), 2).alias("s_acctbal_e2"),
            minor_units(F.col("best_price"), 2).alias("min_price_e2"),
        )
    )


@query(
    "q12_ship_priority",
    oracle=f"""
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > {Q12_SLOW_DAYS}
            THEN 'SLOW'
            WHEN datediff('day', o.o_orderdate, l.l_shipdate) > {Q12_MEDIUM_DAYS}
            THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders⋈lineitem with CASE-conditional counts of
    high- vs low-priority orders per shipping category. The schema has no
    l_shipmode, so the category is the shipping-delay bucket (days from
    order to ship) — same plan: one fact-fact shuffle join, then a
    low-cardinality aggregate with map-side partials. Parity: TPC-H spec
    Q12 shape on available columns."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > Q12_SLOW_DAYS, "SLOW")
        .when(delay > Q12_MEDIUM_DAYS, "MEDIUM")
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q20_part_promotion",
    oracle=f"""
WITH target_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
), heavy AS (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_partkey IN (SELECT p_partkey FROM target_parts)
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > {Q20_MIN_QTY}
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
""",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level nested IN subqueries planned as a
    semi-join chain — LIKE-filtered part keys (broadcast semi) gate the
    lineitem aggregate, whose HAVING survivors (standing in for the
    partsupp availqty comparison) semi-join the supplier dim. Only the
    fact aggregation shuffles; every dimension hop is broadcast. Parity:
    TPC-H spec Q20 shape on available columns."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{Q20_NAME_PREFIX}%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_PRICE)).alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@query(
    "q21_waiting_suppliers",
    oracle=f"""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
), waiting AS (
  SELECT DISTINCT lo.l_suppkey, lo.l_orderkey
  FROM lo
  JOIN per_order po ON po.l_orderkey = lo.l_orderkey
  WHERE lo.late AND po.n_supp > 1 AND po.n_late_supp = 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM waiting w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. The classic formulation is an EXISTS
    plus a correlated NOT EXISTS, both self-joining lineitem; here it is
    decorrelated into ONE per-order aggregate (distinct suppliers vs
    distinct late suppliers) re-joined to the late lines — one shuffle
    on l_orderkey replaces two self-joins, and at 100 TB the per-order
    group is bounded by lines-per-order, never corpus-sized. Late =
    shipped > {Q21_LATE_DAYS} days after ordering (no receipt/commit
    dates in this schema). Parity: TPC-H spec Q21 shape."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
        ).alias("late"),
    )
    # per-order distinct counts as WINDOW aggregates over the same pass
    # (r14, guide §2.4): the groupBy-then-rejoin form referenced `lo`
    # twice, and the differing downstream projections defeated
    # ReuseExchange — lineitem+orders were scanned and joined TWICE
    # (10 parquet scans, 14 Exchanges in the plan). The window form
    # shuffles lo ONCE on l_orderkey and computes both distinct-supplier
    # counts in place; groups are bounded by lines-per-order, so the
    # window buffer is O(7) rows at any corpus size.
    w = Window.partitionBy("l_orderkey")
    waiting = (
        lo.select(
            "l_orderkey",
            "l_suppkey",
            "late",
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(w)
            ).alias("n_late_supp"),
        )
        .filter(
            F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
