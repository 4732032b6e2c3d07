"""Additional TPC-H-shaped query patterns (Q7/Q10/Q14/Q18/Q19) —
broadening the relational surface with the join/predicate shapes real
warehouse workloads hit: symmetric multi-condition joins, HAVING with
join-back, LIKE predicates, disjunctive multi-attribute predicates,
and grouped revenue reporting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table
from .relational import _dec, money_sum


@register(
    "q7_volume_between_nations",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name != n2.n_name)
    GROUP BY supp_nation, cust_nation, yr
    """,
    tags=("join", "tpch"),
)
def q7_volume_between_nations(spark, sf_dir):
    """Q7 shape: cross-nation trade volume by (supplier nation,
    customer nation, year) — the two-role dimension join (nation joined
    twice under different roles). Both nation lookups broadcast."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = F.col("supp_nation") != F.col("cust_nation")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    return (s.join(li, s.s_suppkey == li.l_suppkey)
            .join(o, o.o_orderkey == li.l_orderkey)
            .join(c, c.c_custkey == o.o_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("yr"))
            .agg(money_sum(vol).alias("revenue")))


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "tpch"),
)
def q10_returned_items(spark, sf_dir):
    """Q10 shape: returned-item revenue per customer, top 20. Global
    top-N over an aggregate — heap + driver merge, not a full sort.
    Revenue is decimal-exact, so ORDER BY revenue is deterministic
    across engines (with the key tiebreak)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(money_sum(rev).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20)
            .select("c_custkey", "c_name", "revenue", "n_name"))


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(round(
             100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN
                   CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4)
           AS DOUBLE) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    tags=("join", "tpch"),
)
def q14_promo_share(spark, sf_dir):
    """Q14 shape: promo revenue share — LIKE predicate + conditional
    aggregation, single join, scalar result."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev)
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(100.0 * F.sum(promo).cast("double")
                         / F.sum(rev).cast("double"), 4).alias("promo_share_pct"),
                 F.count("*").alias("n_items")))


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey
    """,
    tags=("join", "tpch"),
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING-qualified keys semi-joined back to the detail
    (the aggregate-then-join-back idiom). The qualifying key set is
    small → broadcast semi join."""
    li = table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 250)
           .select("l_orderkey"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
                  F.col("o_orderkey") == F.col("bk"), "left_semi")
            .groupBy("c_custkey", "c_name", "o_orderkey")
            .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double")
                 .alias("total_qty")))


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 5)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 20 AND 50 AND l_quantity >= 10)
    """,
    tags=("join", "tpch"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    """Q19 shape: disjunction of conjunctive predicates spanning both
    join sides — the optimizer must keep the join on the key and
    evaluate the residual OR post-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1)) |
        ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
         & (F.col("l_quantity") >= 5)) |
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
         & (F.col("l_quantity") >= 10)))
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(money_sum(rev).alias("revenue"), F.count("*").alias("n")))


@register(
    "asof_join_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, lo.o_orderkey AS last_orderkey
    FROM events e LEFT JOIN (
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1) lo
    ON e.user_id = lo.o_custkey
    """,
    tags=("join", "temporal"),
)
def asof_join_latest_order(spark, sf_dir):
    """As-of join (custom operator — Spark has no native ASOF): each
    event takes the most recent order at-or-before its time for the
    same key. One shuffle + per-key sort via the tagged-union/window
    composition in operators/temporal.py; full interleaved-time
    semantics (incl. ties and boundary-equal timestamps) verified
    against brute force in tests/test_temporal.py. On this dataset all
    orders precede all events, so the oracle reduces to
    latest-order-per-customer."""
    from ..operators.temporal import asof_join
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    out = asof_join(ev, o.withColumnRenamed("o_custkey", "user_id"),
                    key="user_id", left_ts="ts", right_ts="o_orderdate",
                    right_cols=["o_orderkey"], tiebreak="o_orderkey")
    return out.select("event_id", "user_id",
                      F.col("o_orderkey").alias("last_orderkey"))


@register(
    "range_join_event_pairs",
    oracle="""
    SELECT count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 30 * 1000000
    """,
    tags=("join", "temporal"),
)
def range_join_event_pairs(spark, sf_dir):
    """Bucketed band join (custom operator): event pairs within 30 s of
    each other. The bucket-replication rewrite plans a hash equi-join
    (verified no NestedLoop in tests) instead of the O(n²) comparison
    the naive inequality join would execute — DuckDB gets the same
    effect natively via IEJoin."""
    from ..operators.temporal import range_join
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    a = ev.select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    pairs = range_join(a, b, "ts_a", "ts_b", within_seconds=30,
                       condition=F.col("id_a") < F.col("id_b"))
    return pairs.agg(F.count("*").alias("n_pairs"))


@register(
    "asof_forward_next_purchase",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'view'),
    p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'),
    nx AS (
      SELECT v.event_id, v.user_id, v.us, min(p.pus) AS next_purchase_us
      FROM v LEFT JOIN p
        ON p.user_id = v.user_id AND p.pus >= v.us
      GROUP BY 1, 2, 3)
    SELECT nx.event_id, nx.user_id, nx.next_purchase_us,
           min(p.p_id) AS next_purchase_id
    FROM nx LEFT JOIN p
      ON p.user_id = nx.user_id AND p.pus = nx.next_purchase_us
    GROUP BY 1, 2, 3
    """,
    tags=("join", "temporal"),
)
def asof_forward_next_purchase(spark, sf_dir):
    """Forward as-of join (operators/temporal.py:asof_join,
    direction='forward'): each 'view' event takes the FIRST 'purchase'
    at-or-after it for the same user — time-to-conversion attribution.
    Same tagged-union/window plan as the backward as-of (one key
    shuffle, one per-key sort) with time reversed; ties at the exact
    microsecond resolve to the smallest purchase event_id on both
    engines. The oracle's O(views × purchases-per-user) join is the
    brute force the operator avoids."""
    from ..operators.temporal import asof_join
    ev = table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .select("event_id", "user_id", "ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("p_id"),
                 F.unix_micros("ts").alias("p_us")))
    out = asof_join(v, p, key="user_id", left_ts="ts", right_ts="p_ts",
                    right_cols=["p_id", "p_us"], tiebreak="p_id",
                    direction="forward")
    return out.select("event_id", "user_id",
                      F.col("p_us").alias("next_purchase_us"),
                      F.col("p_id").alias("next_purchase_id"))
