"""Relational-core queries (SURVEY.md §2.I — the implied surface).

Joins (broadcast/inner/left/semi/anti), aggregations (hash-agg,
distinct, rollup, cube), window functions, sorts/limits, set ops —
everything the reference's architecture implies (dim enrichment) or its
unused deps signal (spark-sql). TPC-H-flavored over the star schema.

Money-arithmetic discipline: every sum/product of doubles is computed
on DECIMAL-cast inputs so the aggregation is EXACT (order-insensitive)
in both engines, then rounded and cast back to DOUBLE. Float sums are
not associative — identical data can round differently across engines
(or across Spark partition merge orders) right at a rounding boundary;
decimal arithmetic removes the entire failure class. Averages divide
the exact decimal sum as a double by the count (identical IEEE op on
identical inputs in both engines).

Scale notes live on each query; the common ones: dims broadcast (no
fact shuffle), aggregations are partial (map-side combine) before the
key shuffle, windows shuffle once per partition key, global sorts only
on already-small results.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.relational import anti_join, enrich_with_dim, semi_join
from .base import register, table


def _dec(col, prec="18,2"):
    return (F.col(col) if isinstance(col, str) else col).cast(f"decimal({prec})")


def money_sum(expr, digits=2):
    """Exact decimal sum → round → double (engine-portable)."""
    return F.round(F.sum(expr), digits).cast("double")


def money_avg(expr, digits=4):
    """avg = exact decimal sum as double / count — identical IEEE
    division in both engines."""
    return F.round(F.sum(expr).cast("double") / F.count("*"), digits)


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide hash aggregation with map-side partial
    aggregation — the shuffle carries one row per (flag,status) per
    task, not per input row."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
    price = _dec("l_extendedprice")
    qty = _dec("l_quantity")
    disc_f = 1 - _dec("l_discount", "4,2")
    tax_f = 1 + _dec("l_tax", "4,2")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(money_sum(qty).alias("sum_qty"),
                 money_sum(price).alias("sum_base_price"),
                 money_sum(price * disc_f).alias("sum_disc_price"),
                 money_sum(price * disc_f * tax_f).alias("sum_charge"),
                 money_avg(qty).alias("avg_qty"),
                 money_avg(price).alias("avg_price"),
                 F.count("*").alias("count_order")))


@register(
    "join_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
    tags=("join", "agg"),
)
def join_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. Selective dim filter first (segment), then join —
    Catalyst pushes both date predicates into the scans; AQE broadcasts
    the filtered customer side at runtime."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(money_sum(revenue).alias("revenue")))


@register(
    "join_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def join_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: five-way join. nation/region/supplier broadcast
    (dims), the orders⋈lineitem core is the only real shuffle — on
    l_orderkey, the natural co-partition key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(money_sum(revenue).alias("revenue")))


@register(
    "join_broadcast_dim_enrich",
    oracle="""
    SELECT r_name, n_name, count(*) AS customers,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join",),
)
def join_broadcast_dim_enrich(spark, sf_dir):
    """The DIM:* enrichment pattern (SURVEY.md §2.I): the reference
    stores dim rows in Redis for point lookups
    (``OdsBaseDbApp.scala:139-164``); Spark-native form is a broadcast
    hash join — dim ships once per executor, fact side never shuffles."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    enriched = enrich_with_dim(
        enrich_with_dim(c, n, c.c_nationkey == n.n_nationkey, how="inner"),
        r, F.col("n_regionkey") == r.r_regionkey, how="inner")
    return (enriched.groupBy("r_name", "n_name")
            .agg(F.count("*").alias("customers"),
                 money_sum(_dec("c_acctbal")).alias("total_acctbal")))


@register(
    "join_left_null_branch",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    """,
    tags=("join", "filter"),
)
def join_left_null_branch(spark, sf_dir):
    """C1's null-branch routing (``OdsBaseLogApp.scala:95-99``) in its
    relational form: left join + IS NULL = the orphan branch."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .filter(F.col("o_orderkey").isNull())
            .select("c_custkey", "c_name"))


@register(
    "join_semi",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 48.0)
    GROUP BY o_orderstatus
    """,
    tags=("join",),
)
def join_semi_q(spark, sf_dir):
    """Left-semi join (EXISTS): no duplication of the left side, right
    side reduced to its join key before shuffle."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48.0)
    return (semi_join(o, li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus").agg(F.count("*").alias("n")))


@register(
    "join_anti",
    oracle="""
    SELECT p_brand, count(*) AS never_ordered
    FROM part WHERE NOT EXISTS (
      SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """,
    tags=("join",),
)
def join_anti_q(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — the delete/orphan idiom (G4's
    relational form)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return (anti_join(p, li, p.p_partkey == li.l_partkey)
            .groupBy("p_brand").agg(F.count("*").alias("never_ordered")))


@register(
    "agg_distinct_count",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS users,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_distinct_count(spark, sf_dir):
    """Exact distinct aggregation — expands to a two-phase plan
    (partial distinct per partition, then merge); at extreme cardinality
    switch to approx_count_distinct (HLL)."""
    return (table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("users"),
                 money_sum(_dec("value", "18,2")).alias("total_value")))


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg",),
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.count("*").alias("customers")))


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark, sf_dir):
    """CUBE over two low-cardinality dimensions."""
    return (table(spark, sf_dir, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 money_sum(_dec("o_totalprice")).alias("total")))


@register(
    "setop_except_intersect",
    oracle="""
    SELECT 'customer_only' AS side, n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS side, n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def setop_except_intersect(spark, sf_dir):
    """EXCEPT / INTERSECT / UNION ALL in one verified query."""
    c = (table(spark, sf_dir, "customer")
         .select(F.col("c_nationkey").alias("n_nationkey")).distinct())
    s = (table(spark, sf_dir, "supplier")
         .select(F.col("s_nationkey").alias("n_nationkey")).distinct())
    only = c.exceptAll(s).withColumn("side", F.lit("customer_only"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    return only.unionByName(both).select("side", "n_nationkey")


@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort",),
)
def sort_limit_topn(spark, sf_dir):
    """Global top-N: Spark plans TakeOrderedAndProject — a per-partition
    heap + driver merge, never a full sort of 100 TB. Deterministic
    tiebreak on the key; o_totalprice is a raw stored double (no
    arithmetic), so values are bit-identical across engines."""
    return (table(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(10)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark, sf_dir):
    """Cumulative window aggregate: one shuffle by the partition key,
    per-partition sort — never global. Decimal-exact accumulation."""
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.round(F.sum(_dec("o_totalprice")).over(w), 2)
                    .cast("double").alias("running_spend")))


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
    tags=("window",),
)
def window_lag_lead(spark, sf_dir):
    """LAG: inter-order gap per customer (sessionization primitive)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.datediff(F.col("o_orderdate"),
                               F.lag("o_orderdate").over(w))
                    .cast("long").alias("days_since_prev")))


@register(
    "window_rank_dense",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    """,
    tags=("window",),
)
def window_rank_dense(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (table(spark, sf_dir, "customer")
            .select("c_nationkey", "c_custkey",
                    F.rank().over(w).cast("long").alias("rnk"),
                    F.dense_rank().over(w).cast("long").alias("drnk")))
