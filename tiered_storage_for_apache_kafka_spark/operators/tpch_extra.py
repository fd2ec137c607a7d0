"""Extended TPC-H-shaped relational coverage.

The driver's star schema is a simplified TPC-H (no partsupp, no
commit/receipt dates, no phone/comment columns), so each classic query is
adapted to the columns that exist while keeping its *plan shape* — that
shape is what matters for the 100 TB design review:

- q4  — EXISTS → left-semi join with a non-equi residual condition;
- q7  — two aliased broadcasts of the same dimension (nation pair);
- q8  — market-share ratio: conditional aggregation over a 7-table join;
- q9  — LIKE-filtered part dim, profit rollup by (nation, year);
- q10 — top-k by aggregate: global sort + limit with deterministic ties;
- q11 — groups filtered against a fraction of the broadcast grand total;
- q13 — left outer join + two-level aggregation (distribution of counts);
- q14 — single-row CASE ratio (promo revenue share);
- q15 — scalar-subquery max: agg → broadcast the 1-row max → equi-filter;
- q16 — NOT IN exclusion subquery (anti join) + multi-column COUNT(DISTINCT);
- q18 — HAVING on a fact-side aggregate joined back to dims;
- q19 — disjunctive predicate groups (OR of AND-blocks) pushed to scan;
- q22 — anti join + exact scalar-average threshold via cross-multiply.

Ratios are emitted as ROUND(double, 6) next to their decimal-exact
numerator/denominator; average thresholds use integer/decimal
cross-multiplication so both engines make the identical keep/drop call.
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

_PRICE = "decimal(18,2)"
_DISC = "decimal(12,4)"


def _disc_price():
    one = F.lit(1).cast(_DISC)
    return F.col("l_extendedprice").cast(_PRICE) * (one - F.col("l_discount").cast(_DISC))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)


@query(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join whose condition mixes an
    equi key with a non-equi residual (shipped after ordered)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       {minor_units_sql(f"SUM({_SQL_DISC_PRICE})", 6)} AS revenue_e6
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension broadcast twice under two
    aliases (supplier nation x customer nation), disjunctive pair filter,
    rollup by year."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(minor_units(F.sum(_disc_price()), 6).alias("revenue_e6"))
    )


@query(
    "q8_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
         {_SQL_DISC_PRICE} AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       {minor_units_sql('''SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END)''', 6)} AS nation_volume_e6,
       {minor_units_sql("SUM(volume)", 6)} AS total_volume_e6,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-table join, conditional aggregation ratio (market
    share of one supplier nation inside a customer region), by year."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    zero = F.lit(0).cast(_PRICE)
    volume = _disc_price()
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(zero)
    ).cast("decimal(25,6)")
    total_vol = F.sum(volume).cast("decimal(25,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (nation_vol * 1000000).cast("bigint").alias("nation_volume_e6"),
            (total_vol * 1000000).cast("bigint").alias("total_volume_e6"),
            F.round(
                nation_vol.cast("double") / total_vol.cast("double"), 6
            ).alias("mkt_share"),
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       {minor_units_sql(f"SUM({_SQL_DISC_PRICE})", 6)} AS sum_profit_e6
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dimension broadcast into the
    fact, profit rolled up by supplier nation and order year."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(minor_units(F.sum(_disc_price()), 6).alias("sum_profit_e6"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {minor_units_sql(f"SUM({_SQL_DISC_PRICE})", 6)} AS revenue_e6
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_e6 DESC, c.c_custkey ASC
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by an aggregate — global
    order-by + limit over the grouped join, ties broken on custkey (the
    final exchange moves only k rows per partition: Spark's
    TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(minor_units(F.sum(_disc_price()), 6).alias("revenue_e6"))
        .orderBy(F.col("revenue_e6").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join preserved through two aggregation
    levels — the distribution of orders-per-customer including zeros."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT {minor_units_sql(f'''SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                     ELSE CAST(0 AS DECIMAL(18,2)) END)''', 6)} AS promo_revenue_e6,
       {minor_units_sql(f"SUM({_SQL_DISC_PRICE})", 6)} AS total_revenue_e6,
       ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 6) AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-row conditional-aggregation ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast(_PRICE)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    ).cast("decimal(25,6)")
    total = F.sum(_disc_price()).cast("decimal(25,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (promo * 1000000).cast("bigint").alias("promo_revenue_e6"),
            (total * 1000000).cast("bigint").alias("total_revenue_e6"),
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6).alias(
                "promo_pct"
            ),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       {minor_units_sql("r.total_revenue", 6)} AS total_revenue_e6
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar-subquery max — the aggregate's 1-row max is
    broadcast back over the aggregate itself (decimal equality is exact,
    so ties surface identically on both engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("decimal(38,6)").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.max_revenue)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            minor_units(F.col("total_revenue"), 6).alias("total_revenue_e6"),
        )
    )


@query(
    "q18_large_volume_customer",
    oracle=f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       {minor_units_sql("SUM(CAST(l.l_quantity AS DECIMAL(18,2)))", 2)} AS total_qty_e2
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE)
HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > CAST(140 AS DECIMAL(18,2))
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact aggregate (orders whose total
    quantity clears a threshold), dims joined in — decimal-exact gate.

    Plan: lineitem pre-aggregates on l_orderkey ALONE (the true grain —
    an order has exactly one customer and date) and the HAVING filter
    runs before any join, so the only fact-fact shuffle carries
    (l_orderkey, qty) pairs and the orders/customer joins see just the
    surviving large-volume orders instead of every lineitem row dragging
    a c_name string through the aggregate shuffle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = (
        li.groupBy("l_orderkey")
        .agg(
            minor_units(F.sum(F.col("l_quantity").cast(_PRICE)), 2).alias(
                "total_qty_e2"
            )
        )
        .filter(F.col("total_qty_e2") > 140 * 100)
    )
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "total_qty_e2",
        )
    )


@query(
    "q19_discount_eligible",
    oracle=f"""
SELECT {minor_units_sql(f"SUM({_SQL_DISC_PRICE})", 6)} AS revenue_e6,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
""",
)
def q19_discount_eligible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive blocks spanning both
    join sides — Catalyst pushes the per-side residuals beneath the join
    and keeps the cross-side OR as the join residual."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (q >= 20) & (q <= 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            minor_units(F.sum(_disc_price()), 6).alias("revenue_e6"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_sales_opportunity",
    oracle=f"""
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_pos,
         COUNT(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       {minor_units_sql("SUM(CAST(c.c_acctbal AS DECIMAL(18,2)))", 2)} AS totacctbal_e2
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n_pos > pos.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti join (customers with no *recent* orders —
    the synthetic data gives every customer at least one order, so the
    classic no-orders-ever predicate would be vacuous) gated on an exact
    scalar-average threshold — `acctbal > avg(positive acctbal)`
    evaluated as decimal cross-multiplication `bal * n > sum` so both
    engines make identical keep/drop decisions (no decimal-division
    scale drift)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast(_PRICE).alias("bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    pos = c.filter(F.col("bal") > 0).agg(
        F.sum("bal").cast("decimal(38,2)").alias("sum_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal") * F.col("n_pos") > F.col("sum_pos"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            minor_units(F.sum("bal"), 2).alias("totacctbal_e2"),
        )
    )


@query(
    "q11_important_brands",
    oracle=f"""
WITH brand AS (
  SELECT p.p_brand,
         CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS brand_value
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), tot AS (
  SELECT CAST(SUM(brand_value) AS DECIMAL(38,6)) AS total_value FROM brand
)
SELECT b.p_brand,
       {minor_units_sql("b.brand_value", 6)} AS brand_value_e6,
       ROUND(CAST(b.brand_value AS DOUBLE) / CAST(t.total_value AS DOUBLE), 6)
         AS value_share
FROM brand b, tot t
WHERE 25 * b.brand_value > t.total_value
""",
)
def q11_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp, so revenue stands in for stock
    value): per-group total filtered against a *fraction of the global
    total* — aggregate, broadcast the 1-row grand total back over every
    group, keep groups above threshold. The keep/drop comparison is
    decimal-exact cross-multiplication (`25 * value > total`), so both
    engines agree at the boundary; only the reported share is a rounded
    double.

    The grand total is a window sum over the ~|brands| aggregated rows
    (exact decimal arithmetic, same value as re-aggregating), so lineitem
    is scanned once instead of twice."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_disc_price()).cast("decimal(38,6)").alias("brand_value"))
    )
    return (
        brand.withColumn(
            "total_value",
            F.sum("brand_value").over(Window.partitionBy()).cast("decimal(38,6)"),
        )
        .filter(F.lit(25) * F.col("brand_value") > F.col("total_value"))
        .select(
            "p_brand",
            minor_units(F.col("brand_value"), 6).alias("brand_value_e6"),
            F.round(
                F.col("brand_value").cast("double")
                / F.col("total_value").cast("double"),
                6,
            ).alias("value_share"),
        )
    )


@query(
    "q16_supplier_part_variety",
    oracle="""
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt,
       COUNT(DISTINCT p.p_partkey) AS part_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 25
  AND p.p_brand <> 'Brand#45'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
""",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN exclusion subquery + multi-column
    COUNT(DISTINCT). The excluded-supplier set (negative balance, standing
    in for the complaints filter) is broadcast as an anti join — exactly
    the null-aware NOT IN plan, legal here because both key columns are
    non-null — then supplier/part variety per (brand, type)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 25) & (F.col("p_brand") != "Brand#45"))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("p_partkey").alias("part_cnt"),
        )
    )
