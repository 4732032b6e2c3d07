"""Round-4 continuation, wave 17: Jarque-Bera normality test and
incremental (delta) maintenance of a join+aggregate materialized view.

Float discipline: JB runs on whole-dollar integers with raw moments as
exact DECIMAL(38,0) sums (order-free), expanded to central moments in
one fixed-arity terminal float expression; the IVM query is all
integer cents — and its Spark side computes the INCREMENTAL plan while
the oracle recomputes from scratch, so the hash check proves
delta-merge ≡ recompute across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table


# ------------------------------------------------ Jarque-Bera

_JB_TERMINAL = """
           round((CAST(s3 AS DOUBLE) / n
                  - 3 * mu * (CAST(s2 AS DOUBLE) / n) + 2 * mu * mu * mu)
                 / ((CAST(s2 AS DOUBLE) / n - mu * mu)
                    * sqrt(CAST(s2 AS DOUBLE) / n - mu * mu)), 4)
             AS skewness,
           round((CAST(s4 AS DOUBLE) / n
                  - 4 * mu * (CAST(s3 AS DOUBLE) / n)
                  + 6 * mu * mu * (CAST(s2 AS DOUBLE) / n)
                  - 3 * mu * mu * mu * mu)
                 / ((CAST(s2 AS DOUBLE) / n - mu * mu)
                    * (CAST(s2 AS DOUBLE) / n - mu * mu)) - 3, 4)
             AS excess_kurtosis
"""


@register(
    "stat_jarque_bera",
    oracle=f"""
    WITH x AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS d FROM orders),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s1,
             sum(CAST(d AS DECIMAL(38,0)) * d) AS s2,
             sum(CAST(d AS DECIMAL(38,0)) * d * d) AS s3,
             sum(CAST(d AS DECIMAL(38,0)) * d * d * d) AS s4
      FROM x),
    e AS (SELECT n, s2, s3, s4,
                 CAST(s1 AS DOUBLE) / n AS mu FROM m)
    SELECT n,
           {_JB_TERMINAL}
    FROM e
    """,
    tags=("stat",),
)
def stat_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality screen on order totals: skewness and
    excess kurtosis from exact raw moments — the moment-based test
    that needs no quantile table (`stat_ks_two_sample` is its
    distribution-comparison sibling). Values quantize to whole-dollar
    BIGINTs so S1..S4 are exact DECIMAL(38,0) sums with headroom to
    petabyte row counts; the central-moment expansion is ONE
    fixed-arity float expression evaluated identically in both
    engines. Scale: a single scan, one aggregate row, four integer
    sums — the cheapest possible distribution profile."""
    x = table(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice) AS BIGINT)").alias("d"))
    dd = F.col("d").cast("decimal(38,0)")
    m = x.agg(F.count("*").cast("long").alias("n"),
              F.sum("d").cast("long").alias("s1"),
              F.sum(dd * F.col("d")).alias("s2"),
              F.sum(dd * F.col("d") * F.col("d")).alias("s3"),
              F.sum(dd * F.col("d") * F.col("d") * F.col("d")).alias("s4"))
    e = m.select("n", "s2", "s3", "s4",
                 (F.col("s1").cast("double") / F.col("n")).alias("mu"))
    n, mu = F.col("n"), F.col("mu")
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (F.col("s3").cast("double") / n
          - 3 * mu * (F.col("s2").cast("double") / n) + 2 * mu * mu * mu)
    m4 = (F.col("s4").cast("double") / n
          - 4 * mu * (F.col("s3").cast("double") / n)
          + 6 * mu * mu * (F.col("s2").cast("double") / n)
          - 3 * mu * mu * mu * mu)
    # m2*sqrt(m2), not pow(m2, 1.5): sqrt is IEEE correctly-rounded in
    # both engines, libm pow(x, 1.5) need not be
    return e.select("n",
                    F.round(m3 / (m2 * F.sqrt(m2)), 4).alias("skewness"),
                    F.round(m4 / (m2 * m2) - 3, 4).alias("excess_kurtosis"))


# ------------------------------------------------ join-view IVM

def _bucket(col: str):
    """0-99 md5 bucket of an integer key — same arithmetic as the
    DuckDB ('0x' || substr(md5(...), 1, 8))::BIGINT % 100 idiom."""
    return (F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8),
                   16, 10).cast("long") % 100)


@register(
    "ivm_join_agg_delta",
    # The ORACLE recomputes the view from the full inputs; the Spark
    # side maintains it incrementally (old-view ⊕ three delta joins).
    # hash_match therefore proves delta-merge ≡ recompute.
    oracle="""
    SELECT c_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    tags=("ivm", "join", "agg"),
)
def ivm_join_agg_delta(spark, sf_dir):
    """Incremental maintenance of a join+aggregate materialized view
    (revenue per nation over orders⋈customer) under batch inserts —
    the join-view generalization of `agg_incremental_merge`. The
    insert batches are a deterministic 10% of orders (dA) and 5% of
    customers (dB); the maintained view is
    old ⊕ Γ(dA⋈B_old) ⊕ Γ(A_old⋈dB) ⊕ Γ(dA⋈dB) — the classic delta
    algebra (ΔQ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB), merged by additive groupBy.
    The driver hash-checks this against a full RECOMPUTE oracle, so
    correctness of the delta decomposition itself is what's verified.
    Scale: each delta join touches |Δ|·selectivity rows, not the base
    fact table — the point of IVM; the merge is one small keyed sum."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    ob = _bucket("o_orderkey")
    cb = _bucket("c_custkey")
    a_old, d_a = o.filter(ob < 90), o.filter(ob >= 90)
    b_old, d_b = c.filter(cb < 95), c.filter(cb >= 95)
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")

    def gamma(orders_side, cust_side):
        return (orders_side.join(cust_side,
                                 orders_side.o_custkey == cust_side.c_custkey)
                .groupBy(F.col("c_nationkey").alias("nation"))
                .agg(F.count("*").cast("long").alias("n_orders"),
                     F.sum(cents).cast("long").alias("revenue_cents")))

    view_old = gamma(a_old, b_old)
    deltas = [gamma(d_a, b_old), gamma(a_old, d_b), gamma(d_a, d_b)]
    merged = view_old
    for d in deltas:
        merged = merged.unionByName(d)
    return (merged.groupBy("nation")
            .agg(F.sum("n_orders").cast("long").alias("n_orders"),
                 F.sum("revenue_cents").cast("long").alias("revenue_cents")))


# ------------------------------------------------ Wald-Wolfowitz runs

@register(
    "stat_runs_test",
    oracle=f"""
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    m AS (SELECT quantile_cont(cents, 0.5) * 2 AS med2 FROM d),
    s AS (
      SELECT day, CASE WHEN 2 * cents > med2 THEN 1 ELSE 0 END AS up
      FROM d, m WHERE 2 * cents <> med2),
    lagged AS (
      SELECT up, lag(up) OVER (ORDER BY day) AS prev FROM s),
    a AS (
      SELECT CAST(sum(up) AS BIGINT) AS n1,
             CAST(sum(1 - up) AS BIGINT) AS n2,
             CAST(1 + sum(CASE WHEN prev IS NOT NULL AND up <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM lagged)
    SELECT n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1))), 4) AS z
    FROM a
    """,
    tags=("stat", "timeseries"),
)
def stat_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the daily revenue series: is the
    above/below-median sequence random, or does it cluster (trend /
    mean-reversion)? The randomness screen that complements
    `stat_mann_kendall_trend` (MK asks 'is there a trend', runs asks
    'is it even random'). Days at exactly the median drop (both
    engines; median doubled to stay integer-comparable); runs count is
    an exact integer lag-transition sum over the day-grain series; z
    is one terminal float."""
    from pyspark.sql import Window as W
    e = table(spark, sf_dir, "events")
    d = (e.groupBy((F.unix_micros("ts") / 86_400_000_000).cast("long")
                   .alias("day"))
         .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
              .cast("long").alias("cents")))
    m = d.agg((F.expr("percentile(cents, 0.5)") * 2).alias("med2"))
    s = (d.crossJoin(F.broadcast(m))
         .filter(2 * F.col("cents") != F.col("med2"))
         .select("day", F.when(2 * F.col("cents") > F.col("med2"), 1)
                 .otherwise(0).alias("up")))
    lagged = s.select("up", F.lag("up").over(W.orderBy("day")).alias("prev"))
    a = lagged.agg(
        F.sum("up").cast("long").alias("n1"),
        F.sum(1 - F.col("up")).cast("long").alias("n2"),
        (1 + F.sum(F.when(F.col("prev").isNotNull()
                          & (F.col("up") != F.col("prev")), 1).otherwise(0)))
        .cast("long").alias("runs"))
    n1, n2 = F.col("n1"), F.col("n2")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)))
    return a.select("n1", "n2", "runs",
                    F.round((F.col("runs") - mu) / F.sqrt(var), 4)
                    .alias("z"))


# ------------------------------------------------ degree assortativity

@register(
    "graph_degree_assortativity",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    dc AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM e0 GROUP BY c),
    dp AS (SELECT p, CAST(count(*) AS BIGINT) AS dp FROM e0 GROUP BY p),
    j AS (
      SELECT dc.dc AS x, dp.dp AS y
      FROM e0 JOIN dc ON e0.c = dc.c JOIN dp ON e0.p = dp.p),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
             sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM j)
    SELECT m,
           round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)), 4)
             AS assortativity
    FROM a
    """,
    tags=("graph", "stat"),
)
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the customer-part purchase graph:
    Pearson correlation between endpoint degrees across edges — do
    broad buyers buy popular parts (assortative, r>0) or niche ones
    (disassortative, r<0)? The structural summary that contextualizes
    `graph_hits_hubs_authorities`. Two degree aggregates + one
    edge-keyed join-back; the correlation reduces to six exact
    integer/DECIMAL(38,0) sums and one terminal float — the same
    moment recipe as `stat_corr_matrix`, over edges instead of rows."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e0 = (o.join(li, o.o_orderkey == li.l_orderkey)
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    dc = e0.groupBy("c").agg(F.count("*").cast("long").alias("dc"))
    dp = e0.groupBy("p").agg(F.count("*").cast("long").alias("dp"))
    j = (e0.join(dc, "c").join(dp, "p")
         .select(F.col("dc").alias("x"), F.col("dp").alias("y")))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    a = j.agg(F.count("*").cast("long").alias("m"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(xd * F.col("x")).alias("sxx"),
              F.sum(yd * F.col("y")).alias("syy"),
              F.sum(xd * F.col("y")).alias("sxy"))
    md = F.col("m").cast("double")
    num = md * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt((md * F.col("sxx").cast("double")
                  - F.col("sx").cast("double") * F.col("sx"))
                 * (md * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy")))
    return a.select("m", F.round(num / den, 4).alias("assortativity"))
