"""Remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/
Q20/Q21/Q22), adapted to the testdata star schema.

The testdata has no ``partsupp`` table and lineitem lacks
commitdate/receiptdate/shipmode, so shapes that need them are adapted:
the part-supplier relation is derived as ``SELECT DISTINCT l_partkey,
l_suppkey FROM lineitem``, supply cost is proxied by ``p_retailprice``,
and ship-mode/receipt-lag predicates become priority/returnflag
predicates. What each query *exercises* — correlated scalar subqueries,
join-back-to-max, two-level aggregation, EXISTS/NOT-EXISTS rewritten as
per-group stats, HAVING against a global scalar — is preserved.

Scale notes per query in docstrings; decimal/float parity discipline
per queries/base.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table
from .relational import _dec, money_sum


def _ps(spark, sf_dir):
    """The derived part-supplier relation (stand-in for partsupp).
    ~52k distinct pairs at sf0.01 — one exact-distinct shuffle, reused
    by Q2/Q16; at 100 TB this would be a maintained bucketed table, not
    a per-query distinct."""
    return (table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey").distinct())


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "tpch"),
)
def q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-filter-aggregate — the pushdown showcase. All
    three predicates reach the parquet reader (min/max row-group skip
    at scale); no shuffle at all (partial+final agg only)."""
    li = table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & F.col("l_discount").between(0.05, 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(money_sum(_dec("l_extendedprice") * _dec("l_discount", "4,2"))
                 .alias("revenue"),
                 F.count("*").alias("n")))


@register(
    "q2_best_supplier_per_part",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_size = 25 AND p_type = 'LARGE'),
    best AS (SELECT p_partkey AS bk, max(s_acctbal) AS max_bal
             FROM cand GROUP BY p_partkey)
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
    FROM cand JOIN best ON p_partkey = bk AND s_acctbal = max_bal
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100
    """,
    tags=("join", "tpch", "subquery"),
)
def q2_best_supplier_per_part(spark, sf_dir):
    """Q2 shape: best (max-acctbal, proxy for min supplycost) supplier
    per qualifying part — the correlated-max subquery as aggregate +
    join-back. The part filter lands before the join (selective:
    1/50 sizes × 1/6 types), so `cand` is small; the max is a
    broadcast join-back, not a window over the full relation."""
    p = (table(spark, sf_dir, "part")
         .filter((F.col("p_size") == 25) & (F.col("p_type") == "LARGE"))
         .select("p_partkey", "p_brand"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    # semi-join the part filter BELOW the distinct: the dedup shuffle
    # then runs on 1/(50·6) of the pairs instead of the full relation
    ps = (table(spark, sf_dir, "lineitem")
          .join(F.broadcast(p.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
          .select("l_partkey", "l_suppkey").distinct())
    cand = (ps
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("p_partkey", "p_brand", "s_suppkey", "s_name",
                    "s_acctbal", "n_name"))
    # correlated max as a window over the (post-filter, tiny) candidate
    # set — one pass; a groupBy + join-back would re-derive `cand` and
    # with it the full lineitem semi-join subtree
    from pyspark.sql import Window
    mx = F.max("s_acctbal").over(Window.partitionBy("p_partkey"))
    return (cand.withColumn("max_bal", mx)
            .filter(F.col("s_acctbal") == F.col("max_bal"))
            .select("p_partkey", "p_brand", "s_suppkey", "s_name",
                    "s_acctbal", "n_name")
            .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
            .limit(100))


@register(
    "q8_market_share",
    oracle="""
    SELECT yr,
           CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_7'
                                    THEN vol END) AS DOUBLE)
                      / CAST(sum(vol) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             n1.n_name AS supp_nation,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS vol
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA')
    GROUP BY yr
    """,
    tags=("join", "tpch"),
)
def q8_market_share(spark, sf_dir):
    """Q8 shape: NATION_7's share of supply volume into ASIA-customer
    orders, by year — two-role nation join + region rollup + conditional
    share. The customer-side region filter is pushed through the
    broadcast dim chain; share = exact decimal sums → one double
    division, rounded 6dp (ratio discipline)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("c_rk"))
    r = (table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    base = (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .select(F.year("l_shipdate").cast("long").alias("yr"),
                    F.col("supp_nation"), vol.alias("vol")))
    nat = F.when(F.col("supp_nation") == "NATION_7", F.col("vol"))
    return (base.groupBy("yr")
            .agg(F.round(F.sum(nat).cast("double")
                         / F.sum("vol").cast("double"), 6).alias("mkt_share")))


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          - CAST(p_retailprice AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(6,2))
                            * CAST(0.10 AS DECIMAL(3,2))), 2) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, yr
    """,
    tags=("join", "tpch"),
)
def q9_product_profit(spark, sf_dir):
    """Q9 shape: profit (revenue minus cost proxy — 10% of retail price
    per unit, standing in for ps_supplycost) by supplier nation × year,
    over parts matching a name pattern. The part filter is applied
    before its broadcast; all money math in exact decimals."""
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%gear%"))
         .select("p_partkey", "p_retailprice"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = (_dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
              - _dec("p_retailprice") * _dec("l_quantity", "6,2")
              * F.lit(0.10).cast("decimal(3,2)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").cast("long").alias("yr"))
            .agg(money_sum(profit).alias("profit")))


@register(
    "q11_important_stock_value",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS partkey, CAST(round(v, 2) AS DOUBLE) AS value
    FROM val
    WHERE CAST(v AS DECIMAL(38,2)) * 2
          * (SELECT count(*) FROM val)
          > (SELECT CAST(sum(v) AS DECIMAL(38,2)) * 3 FROM val)
    """,
    tags=("agg", "tpch", "subquery"),
)
def q11_important_stock_value(spark, sf_dir):
    """Q11 shape: per-part traded value HAVING > fraction of the global
    total — a scalar-subquery threshold. TPC-H scales the fraction by
    1/SF; a fixed fraction silently returns 0 rows once part count
    outgrows it (found by the whole-registry sf0.1 non-empty gate), so
    the cut is SCALE-FREE: value > 1.5x the average per-part share,
    written cross-multiplied (v*2*n > 3*total) so the comparison is
    exact DECIMAL(38,2) with no division at all. The per-part agg is
    one shuffle; the (total, n) scalar is a second agg over its
    (small) output, broadcast back as a cross join of one row."""
    li = table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    val = li.groupBy("l_partkey").agg(F.sum(vol).alias("v"))
    tot = val.agg(F.sum("v").cast("decimal(38,2)").alias("s"),
                  F.count("*").alias("n"))
    return (val.join(F.broadcast(tot))
            .filter(F.col("v").cast("decimal(38,2)") * 2 * F.col("n")
                    > F.col("s") * 3)
            .select(F.col("l_partkey").alias("partkey"),
                    F.round("v", 2).cast("double").alias("value")))


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    tags=("join", "tpch"),
)
def q12_priority_by_status(spark, sf_dir):
    """Q12 shape (shipmode → linestatus): conditional counts of
    high/low-priority orders per line status. Integer counts — exact
    on any engine; the date band prunes at the scan."""
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")))
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_count")))


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_order_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts — LEFT OUTER join
    with an extra join-side predicate (kept in the ON clause: it must
    not turn the outer join inner), then two-level aggregation. The
    second agg's input is |customers| rows, already tiny."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per = (c.join(o, (c.c_custkey == o.o_custkey)
                  & (o.o_orderpriority != "5-LOW"), "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("c_count")))
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "tpch", "subquery"),
)
def q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) achieving the maximum half-year revenue — the
    view + scalar-max-subquery idiom. Revenue is rounded *before* the
    max/equality so the comparison is on identical doubles in both
    engines. The revenue view is computed once and reused for both the
    max and the join (Spark reuses the exchange)."""
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-07-01")))
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(money_sum(vol).alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (s.join(revenue, s.s_suppkey == F.col("supplier_no"))
            .join(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .select("s_suppkey", "s_name", "total_revenue"))


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "tpch", "subquery"),
)
def q16_supplier_count_by_part(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per (brand, type, size),
    excluding complaint suppliers (NOT IN → broadcast anti join). The
    part filter is applied pre-broadcast; count(DISTINCT) expands to
    the two-phase distinct aggregate."""
    ps = _ps(spark, sf_dir)
    p = (table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#45")
                 & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)))
    bad = (table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
            .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS ak,
             0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)) AS half_avg
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON l_partkey = ak
    WHERE p_brand = 'Brand#23' AND l_quantity < half_avg
    """,
    tags=("join", "tpch", "subquery"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Q17: revenue from below-half-average-quantity lines of one brand
    — the correlated AVG subquery as per-key aggregate + join-back.
    half_avg follows the money_avg discipline (exact decimal sum →
    double ÷ count → × 0.5: identical IEEE ops in both engines), so the
    `<` cut is deterministic. Spark computes pavg only over the brand's
    parts (semi-join pushdown applied by hand — the oracle's full-table
    pavg agrees on the joined subset)."""
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#23").select("p_partkey"))
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pavg = (brand_li.groupBy(F.col("l_partkey").alias("ak"))
            .agg((0.5 * (F.sum(_dec("l_quantity")).cast("double")
                         / F.count("*"))).alias("half_avg")))
    return (brand_li.join(F.broadcast(pavg), F.col("l_partkey") == F.col("ak"))
            .filter(F.col("l_quantity") < F.col("half_avg"))
            .agg(F.round(F.sum(_dec("l_extendedprice")) / 7.0, 2)
                 .cast("double").alias("avg_yearly")))


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 500)
    """,
    tags=("join", "tpch", "subquery"),
)
def q20_excess_shippers(spark, sf_dir):
    """Q20 shape: suppliers who shipped > 500 units of 'red%' parts
    since 1997 — the nested IN-chain (part ⊂ lineitem ⊂ supplier) as
    two semi joins: parts broadcast into the lineitem scan, qualifying
    suppliers broadcast into the supplier scan. Quantity HAVING uses an
    exact decimal sum."""
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("red%")).select("p_partkey"))
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") >= "1997-01-01")
          .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"),
                "left_semi"))
    qual = (li.groupBy("l_suppkey")
            .agg(F.sum(_dec("l_quantity")).alias("q"))
            .filter(F.col("q") > 500).select("l_suppkey"))
    s = table(spark, sf_dir, "supplier")
    return (s.join(F.broadcast(qual), s.s_suppkey == F.col("l_suppkey"),
                   "left_semi")
            .select("s_suppkey", "s_name"))


@register(
    "q21_sole_returner",
    oracle="""
    WITH ostats AS (
      SELECT l_orderkey AS ok,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_r_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN ostats   ON ok = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_supp > 1 AND n_r_supp = 1
    GROUP BY s_name
    """,
    tags=("join", "agg", "tpch", "subquery"),
)
def q21_sole_returner(spark, sf_dir):
    """Q21 shape: suppliers solely responsible for returns on
    multi-supplier finalized orders. The classic EXISTS(other supplier)
    AND NOT EXISTS(other supplier who returned) pair is rewritten as
    per-order supplier stats (distinct counts) joined back — one
    aggregation instead of two correlated self-joins; at scale this is
    one shuffle on l_orderkey reused by agg and join."""
    li = table(spark, sf_dir, "lineitem")
    ostats = (li.groupBy(F.col("l_orderkey").alias("ok"))
              .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                   F.countDistinct(
                       F.when(F.col("l_returnflag") == "R",
                              F.col("l_suppkey"))).alias("n_r_supp")))
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F").select("o_orderkey"))
    s = table(spark, sf_dir, "supplier")
    return (li.filter(F.col("l_returnflag") == "R")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(ostats, li.l_orderkey == F.col("ok"))
            .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
            .join(s, li.l_suppkey == s.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait")))


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH cavg AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, cavg
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("join", "agg", "tpch", "subquery"),
)
def q22_idle_rich_customers(spark, sf_dir):
    """Q22 shape: above-average-balance customers with no orders, per
    country — scalar AVG subquery + NOT EXISTS (anti join). The
    threshold follows the money_avg discipline; the anti join's build
    side is the distinct custkeys of orders."""
    c = table(spark, sf_dir, "customer")
    cavg = (c.filter(F.col("c_acctbal") > 0)
            .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count("*"))
                 .alias("a")))
    o = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (c.join(F.broadcast(cavg))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntry"))
            .agg(F.count("*").alias("numcust"),
                 money_sum(_dec("c_acctbal")).alias("totacctbal")))


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "join"),
)
def q4_order_priority_exists(spark, sf_dir):
    """Q4 shape (priority checking): orders in one quarter having at
    least one qualifying lineitem, counted per priority. EXISTS is a
    LEFT SEMI join — the probe side never duplicates, and the quarter
    band prunes the orders scan (no commitdate/receiptdate in the
    adapted schema; the qualifying predicate is l_quantity > 45)."""
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-07-01")
                 & (F.col("o_orderdate") < "1996-10-01")))
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") > 45)
          .select("l_orderkey"))
    return (o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))
