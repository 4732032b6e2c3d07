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
