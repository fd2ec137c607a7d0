"""Remaining relational operator categories from SURVEY.md §2.4:
set operations, semi/anti joins, deterministic top-k (sort/limit),
scalar functions (base64 — the reference's index-encoding wrapper), and
distinct aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import (
    minor_units,
    minor_units_sql,
    query,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table


@query(
    "set_ops_customer_segments",
    oracle="""
SELECT c_custkey, 'building_no_orders' AS bucket FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_custkey FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
)
UNION ALL
SELECT c_custkey, 'machinery_with_orders' AS bucket FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
  INTERSECT
  SELECT o_custkey FROM orders
)
""",
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL over key sets."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = customer.join(
        orders, orders.o_custkey == customer.c_custkey
    ).select("c_custkey")
    machinery = customer.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    order_keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    a = building.exceptAll(with_orders.distinct()).distinct().select(
        "c_custkey", F.lit("building_no_orders").alias("bucket")
    )
    b = machinery.intersect(order_keys).select(
        "c_custkey", F.lit("machinery_with_orders").alias("bucket")
    )
    return a.unionAll(b)


@query(
    "semi_anti_join_orders",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE has_li) AS n_with_lineitems,
       COUNT(*) FILTER (WHERE NOT has_li) AS n_without_lineitems
FROM (
  SELECT o.o_orderkey, o.o_orderpriority,
         EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                   AND l.l_shipdate > TIMESTAMP '1995-01-01 00:00:00') AS has_li
  FROM orders o
)
GROUP BY o_orderpriority
""",
)
def semi_anti_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join (TPC-H Q4 shape): EXISTS realized as left_semi /
    left_anti — at scale these shuffle only the keys, never materialize
    the probe side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    semi = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_with_lineitems"))
    )
    anti = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_without_lineitems"))
    )
    return (
        semi.join(anti, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce("n_with_lineitems", F.lit(0)).alias("n_with_lineitems"),
            F.coalesce("n_without_lineitems", F.lit(0)).alias("n_without_lineitems"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {minor_units_sql('''SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(12,4)))''', 6)} AS revenue_e6,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — every predicate must reach the
    parquet scan (PushedFilters), zero shuffle, single global agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            minor_units(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(12,4)")
                ),
                6,
            ).alias("revenue_e6"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "topk_orders_per_priority",
    oracle=f"""
SELECT o_orderpriority, o_orderkey,
       {minor_units_sql("CAST(o_totalprice AS DECIMAL(18,2))", 2)} AS totalprice_e2,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                                     o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 10
""",
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (sort/limit family): rank on a decimal cast
    with an id tiebreak. At scale this is the rank-pushdown pattern (AQE
    turns it into per-partition partial top-k before the shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_orderpriority").orderBy(price.desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select(
            "o_orderpriority",
            "o_orderkey",
            minor_units(price, 2).alias("totalprice_e2"),
            "rnk",
        )
    )


@query(
    "scalar_base64_roundtrip",
    oracle="""
SELECT doc_id,
       to_base64(CAST(substr(text, 1, 48) AS BLOB)) AS head_b64,
       length(to_base64(CAST(substr(text, 1, 48) AS BLOB))) AS b64_len,
       substr(md5(to_base64(CAST(substr(text, 1, 48) AS BLOB))), 1, 16) AS b64_md5_head
FROM documents
""",
)
def scalar_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function parity: base64 (the reference wraps its delta-coded
    chunk index in base64, README §'Index encoding') composed with substr
    and md5 — all JVM-side built-ins."""
    docs = load_table(spark, sf_dir, "documents")
    b64 = F.base64(F.encode(F.substring("text", 1, 48), "UTF-8"))
    return docs.select(
        "doc_id",
        b64.alias("head_b64"),
        F.length(b64).cast("bigint").alias("b64_len"),
        F.substring(F.md5(b64), 1, 16).alias("b64_md5_head"),
    )


@query(
    "distinct_daily_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (expand-based two-phase plan in Spark)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "rollup_pricing",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {minor_units_sql("SUM(CAST(l_quantity AS DECIMAL(18,2)))", 2)} AS sum_qty_e2
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation (ROLLUP): subtotal rows carry NULL group
    keys in both engines; Spark executes it as a single Expand + one
    shuffle, not one job per level."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        minor_units(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).alias(
            "sum_qty_e2"
        ),
    )


@query(
    "q17_small_quantity_parts",
    oracle=f"""
SELECT l.l_partkey,
       COUNT(*) AS n_small,
       {minor_units_sql("SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))", 2)} AS small_revenue_e2
FROM lineitem l
JOIN (
  SELECT l_partkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE 5 * l.l_quantity * a.cnt < a.sum_qty
GROUP BY l.l_partkey
""",
)
def q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar subquery decorrelated into a
    self-join against per-part aggregates). The threshold 'quantity <
    0.2 * avg' is cross-multiplied to the integer-exact form
    '5*qty*cnt < sum' so both engines decide identically."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(F.broadcast(per_part), "l_partkey")
        .filter(5 * F.col("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            minor_units(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2
            ).alias("small_revenue_e2"),
        )
    )


@query(
    "moving_window_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         {minor_units_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS daily_revenue_e2
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT CAST(day AS VARCHAR) AS day, daily_revenue_e2,
       CAST(SUM(daily_revenue_e2) OVER (ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_7d_e2
FROM daily
""",
)
def moving_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based moving window (trailing 7 rows over a daily series) —
    the time-series smoothing shape; one shuffle to order the (small)
    daily series."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        minor_units(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias(
            "daily_revenue_e2"
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "daily_revenue_e2",
        F.sum("daily_revenue_e2").over(w).cast("bigint").alias("trailing_7d_e2"),
    )


@query(
    "top_supplier_per_part",
    oracle=f"""
SELECT l_partkey, l_suppkey, total_qty_e2, n_shipments
FROM (
  SELECT l_partkey, l_suppkey,
         {minor_units_sql("SUM(CAST(l_quantity AS DECIMAL(18,2)))", 2)} AS total_qty_e2,
         COUNT(*) AS n_shipments,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) DESC,
                                     l_suppkey ASC) AS rnk
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
) WHERE rnk = 1
""",
)
def top_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-family argmax-per-group: aggregate then rank inside the group
    with a deterministic tiebreak (decimal quantities so both engines
    order identically)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = minor_units(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        qty.alias("total_qty_e2"), F.count(F.lit(1)).alias("n_shipments")
    )
    # argmax as a plain MAX over a comparison struct (qty desc, suppkey
    # asc via negation) instead of a row_number window: the second
    # aggregation is map-side partial and never sorts, where the window
    # form re-shuffles AND sorts every (part, supplier) group
    best = (
        per_supp.select(
            "l_partkey",
            F.struct(
                F.col("total_qty_e2"),
                (-F.col("l_suppkey")).alias("neg_suppkey"),
                F.col("l_suppkey").alias("l_suppkey"),
                F.col("n_shipments").alias("n_shipments"),
            ).alias("s"),
        )
        .groupBy("l_partkey")
        .agg(F.max("s").alias("s"))
    )
    return best.select(
        "l_partkey",
        F.col("s.l_suppkey").alias("l_suppkey"),
        F.col("s.total_qty_e2").alias("total_qty_e2"),
        F.col("s.n_shipments").alias("n_shipments"),
    )


@query(
    "pivot_event_type_daily",
    oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type NOT IN ('click','view','purchase')) AS other
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): fixed pivot values so the
    plan is a single pass — no second job to discover distinct values."""
    events = load_table(spark, sf_dir, "events")
    known = ["click", "view", "purchase"]
    aggs = [
        F.count(F.when(F.col("event_type") == v, 1)).alias(v) for v in known
    ] + [F.count(F.when(~F.col("event_type").isin(known), 1)).alias("other")]
    return events.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(*aggs)


@query(
    "cube_order_stats",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS grouping_level,
       COUNT(*) AS n_orders,
       {minor_units_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_price_e2
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with GROUPING disambiguation: all 4 grouping-set
    combinations in one Expand + single shuffle; grouping_level
    distinguishes a real NULL key from a subtotal row."""
    o = load_table(spark, sf_dir, "orders")
    lvl = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast(
        "bigint"
    )
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        lvl.alias("grouping_level"),
        F.count(F.lit(1)).alias("n_orders"),
        minor_units(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias(
            "total_price_e2"
        ),
    )


@query(
    "value_percentiles",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (continuous interpolation) — both
    engines sort and linearly interpolate, so rounded values agree.
    At 100 TB the approx_percentile sketch replaces this plan-for-plan;
    exact is used here because the oracle must hash-match."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "json_props_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics: JSON path extraction from a string
    column straight into a typed aggregate (from_json schema projection
    — at 100 TB the parse is a narrow codegen stage, one shuffle on the
    group key)."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "lag_lead_user_deltas",
    oracle="""
SELECT user_id, event_id,
       CAST(seq AS BIGINT) AS seq,
       prev_event_id, next_event_id, first_event_id
FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER w AS seq,
         LAG(event_id) OVER w AS prev_event_id,
         LEAD(event_id) OVER w AS next_event_id,
         FIRST_VALUE(event_id) OVER w AS first_event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
)
WHERE seq <= 5
""",
)
def lag_lead_user_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions (LAG/LEAD/FIRST_VALUE) over per-user
    event timelines — one shuffle on user_id, one sort, all four
    functions evaluated in a single window pass. Ordering is on whole-second
    timestamps + event_id so both engines (ns vs us precision) break
    ties identically."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts"), F.col("event_id"))
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(w).cast("bigint").alias("seq"),
            F.lag("event_id").over(w).alias("prev_event_id"),
            F.lead("event_id").over(w).alias("next_event_id"),
            F.first("event_id").over(w).alias("first_event_id"),
        )
        .filter(F.col("seq") <= 5)
    )


@query(
    "ntile_customer_quartiles",
    oracle=f"""
SELECT quartile,
       COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
       {minor_units_sql("SUM(CAST(c_acctbal AS DECIMAL(18,2)))", 2)} AS total_bal_e2
FROM (
  SELECT c_custkey, c_acctbal,
         CAST(NTILE(4) OVER (ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC,
                             c_custkey ASC) AS INT) AS quartile
  FROM customer
)
GROUP BY quartile
""",
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: customers split into balance quartiles (total
    order made deterministic with decimal cast + custkey tiebreak), then
    rolled up per quartile."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(
        F.col("c_acctbal").cast("decimal(18,2)").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("quartile", F.ntile(4).over(w).cast("int"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").cast("bigint").alias("min_custkey"),
            minor_units(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).alias(
                "total_bal_e2"
            ),
        )
    )


@query(
    "value_dispersion_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS mean_value,
       ROUND(STDDEV_SAMP(value), 4) AS stddev_value,
       ROUND(VAR_SAMP(value), 4) AS var_value
FROM events
GROUP BY event_type
""",
)
def value_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean / sample stddev / sample variance)
    per group — both engines use numerically-stable single-pass
    estimators, so 4-decimal rounding agrees."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
    )


@query(
    "grouping_sets_order_mix",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS grouping_level,
       COUNT(*) AS n_orders,
       {minor_units_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_price_e2
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
""",
)
def grouping_sets_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with an asymmetric set list — (status,
    priority), (priority), and grand total — a shape neither CUBE nor
    ROLLUP can express; still one Expand + one shuffle, with
    grouping_level separating subtotal rows from real NULL keys."""
    o = load_table(spark, sf_dir, "orders")
    lvl = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast(
        "bigint"
    )
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        lvl.alias("grouping_level"),
        F.count(F.lit(1)).alias("n_orders"),
        minor_units(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias(
            "total_price_e2"
        ),
    )


@query(
    "full_outer_daily_activity",
    oracle="""
WITH clicks AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS DATE)
), purchases AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, CAST(ts AS DATE)
), j AS (
  SELECT COALESCE(c.d, p.d) AS day,
         CASE WHEN c.n_clicks IS NOT NULL AND p.n_purchases IS NOT NULL THEN 'both'
              WHEN c.n_clicks IS NOT NULL THEN 'click_only'
              ELSE 'purchase_only' END AS side,
         COALESCE(c.n_clicks, 0) + COALESCE(p.n_purchases, 0) AS n_events
  FROM clicks c FULL OUTER JOIN purchases p
    ON c.user_id = p.user_id AND c.d = p.d
)
SELECT CAST(day AS VARCHAR) AS day, side,
       COUNT(*) AS n_user_days,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM j GROUP BY day, side
""",
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join coverage: per (user, day) click activity joined
    full-outer to purchase activity, classifying user-days as
    click-only / purchase-only / both. Both sides pre-aggregate before
    the join (the shuffle carries one row per user-day per side, not raw
    events), and the outer join keys are the aggregation keys so the
    exchanges are reused across agg and join."""
    events = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("d")

    def side_counts(ev_type: str, out: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == ev_type)
            .groupBy("user_id", day)
            .agg(F.count(F.lit(1)).alias(out))
        )

    c = side_counts("click", "n_clicks")
    p = side_counts("purchase", "n_purchases").withColumnsRenamed(
        {"user_id": "p_user_id", "d": "p_d"}
    )
    j = c.join(
        p,
        (c.user_id == p.p_user_id) & (c.d == p.p_d),
        "full_outer",
    ).select(
        F.coalesce("d", "p_d").alias("day"),
        # side-presence is marked by each side's aggregate column, not the
        # join key — a NULL user_id never equi-joins, and keying on it
        # would misclassify those rows
        F.when(
            F.col("n_clicks").isNotNull() & F.col("n_purchases").isNotNull(), "both"
        )
        .when(F.col("n_clicks").isNotNull(), "click_only")
        .otherwise("purchase_only")
        .alias("side"),
        (
            F.coalesce("n_clicks", F.lit(0)) + F.coalesce("n_purchases", F.lit(0))
        ).alias("n_events"),
    )
    return j.groupBy(F.col("day").cast("string").alias("day"), "side").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
