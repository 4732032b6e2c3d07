"""Round-9 analytics wave 1: Yule-Walker AR(2) fit + forecast, Katz
centrality by exact-integer iteration, and the Hodges-Lehmann shift
estimator.

Cross-engine discipline as everywhere in the registry: moment
accumulations in DECIMAL(38,0)/BIGINT, ACF inputs rounded to 6dp
BEFORE any recursion so both engines recurse on identical doubles,
order statistics via row_number with full tiebreaks (never
interpolating aggregates over floats), iterative kernels on exact
integers with one terminal float divide.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .analytics28 import _acf_expr_sql
from .base import register, table

# ------------------------------------------------ Yule-Walker AR(2)

# shared recursion text (both engines run the same expression tree on
# 6dp-rounded r1/r2 and exact mu / last observations)
_YW_PHI1 = "r1 * (1.0 - r2) / (1.0 - r1 * r1)"
_YW_PHI2 = "(r2 - r1 * r1) / (1.0 - r1 * r1)"


def _yw_oracle() -> str:
    leads = ",\n             ".join(
        f"lead(x, {k}) OVER (ORDER BY d) AS x{k}" for k in (1, 2))
    aggs = ",\n             ".join(
        f"CAST(sum(CAST(x AS DECIMAL(38,0)) * x{k}) AS DECIMAL(38,0))"
        f" AS p{k},\n             "
        f"CAST(sum(CASE WHEN x{k} IS NOT NULL THEN x ELSE 0 END)"
        f" AS BIGINT) AS a{k},\n             "
        f"CAST(sum(x{k}) AS BIGINT) AS b{k}"
        for k in (1, 2))
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    l AS (SELECT x, {leads} FROM daily),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
               AS q,
             {aggs}
      FROM l),
    tail2 AS (
      SELECT max(CASE WHEN rn = 1 THEN x END) AS x_last,
             max(CASE WHEN rn = 2 THEN x END) AS x_prev
      FROM (SELECT x, row_number() OVER (ORDER BY d DESC) AS rn
            FROM daily)
      ),
    acf AS (
      SELECT {_acf_expr_sql(1)} AS r1, {_acf_expr_sql(2)} AS r2,
             CAST(s AS DOUBLE) / n AS mu
      FROM g),
    fit AS (
      SELECT r1, r2, mu, x_last, x_prev,
             {_YW_PHI1} AS phi1, {_YW_PHI2} AS phi2
      FROM acf CROSS JOIN tail2),
    fc AS (
      SELECT phi1, phi2, mu, x_last,
             mu + phi1 * (x_last - mu) + phi2 * (x_prev - mu) AS f1
      FROM fit)
    SELECT round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
           round(f1, 4) AS forecast_h1,
           round(mu + phi1 * (f1 - mu) + phi2 * (x_last - mu), 4)
             AS forecast_h2
    FROM fc
    """


@register(
    "ts_yule_walker_ar2",
    oracle=_yw_oracle(),
    tags=("timeseries", "stat"),
)
def ts_yule_walker_ar2(spark, sf_dir):
    """AR(2) fit of the daily order-count series by the Yule-Walker
    equations plus the 1- and 2-step-ahead forecasts — the third leg
    of the Box-Jenkins triple (ACF `ts_autocorrelation_lags`
    identifies, PACF `ts_pacf_durbin` orders, Yule-Walker fits):
    phi1 = r1(1-r2)/(1-r1²), phi2 = (r2-r1²)/(1-r1²), and forecasts
    in deviation-from-mean form re-using phi-hat.

    Exactness: r1/r2 come from the certified exact DECIMAL(38,0) ACF
    algebra rounded to 6dp BEFORE the fit; mu is one exact-integer
    divide; the last two observations are exact order statistics.
    Both engines evaluate one shared expression tree from there.
    Scale: identical to the ACF — the fact stream collapses to the
    day grain first; everything after is scalar."""
    daily = (table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    w = Window.orderBy("d")
    lagged = daily.select(
        "x", *[F.lead("x", k).over(w).alias(f"x{k}") for k in (1, 2)])
    dec = "decimal(38,0)"
    aggs = [F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("q")]
    for k in (1, 2):
        aggs += [
            F.sum(F.col("x").cast(dec) * F.col(f"x{k}")).cast(dec)
            .alias(f"p{k}"),
            F.sum(F.when(F.col(f"x{k}").isNotNull(), F.col("x"))
                  .otherwise(0)).cast("long").alias(f"a{k}"),
            F.sum(f"x{k}").cast("long").alias(f"b{k}")]
    g = lagged.agg(*aggs)
    wd = Window.orderBy(F.col("d").desc())
    tail2 = (daily.withColumn("rn", F.row_number().over(wd))
             .filter(F.col("rn") <= 2)
             .agg(F.max(F.when(F.col("rn") == 1, F.col("x")))
                  .alias("x_last"),
                  F.max(F.when(F.col("rn") == 2, F.col("x")))
                  .alias("x_prev")))
    acf = g.selectExpr(f"{_acf_expr_sql(1)} AS r1",
                       f"{_acf_expr_sql(2)} AS r2",
                       "CAST(s AS DOUBLE) / n AS mu")
    fit = (acf.crossJoin(F.broadcast(tail2))
           .selectExpr("r1", "r2", "mu", "x_last", "x_prev",
                       f"{_YW_PHI1} AS phi1", f"{_YW_PHI2} AS phi2"))
    fc = fit.selectExpr(
        "phi1", "phi2", "mu", "x_last",
        "mu + phi1 * (x_last - mu) + phi2 * (x_prev - mu) AS f1")
    return fc.selectExpr(
        "round(phi1, 6) AS phi1", "round(phi2, 6) AS phi2",
        "round(f1, 4) AS forecast_h1",
        "round(mu + phi1 * (f1 - mu) + phi2 * (x_last - mu), 4)"
        " AS forecast_h2")


# ------------------------------------------------ Katz centrality

_KATZ_ROUNDS = 4
_KATZ_INV_ALPHA = 200  # alpha = 1/200 < 1/lambda_max for this graph
_KATZ_TOP = 20


def _katz_oracle() -> str:
    steps = []
    for i in range(_KATZ_ROUNDS):
        scale = _KATZ_INV_ALPHA ** (i + 1)
        steps.append(f"""
    x{i + 1} AS MATERIALIZED (
      SELECT d.b AS node,
             CAST(sum(x.v) + {scale} AS DECIMAL(38,0)) AS v
      FROM dir d JOIN x{i} x ON x.node = d.a
      GROUP BY d.b)""")
    final_scale = _KATZ_INV_ALPHA ** _KATZ_ROUNDS
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey),
    dir AS MATERIALIZED (SELECT u AS a, v AS b FROM e
            UNION ALL SELECT v, u FROM e),
    x0 AS MATERIALIZED (
      SELECT DISTINCT a AS node, CAST(1 AS DECIMAL(38,0)) AS v
      FROM dir),{",".join(steps)}
    SELECT node, round(CAST(v AS DOUBLE) / {final_scale}, 6) AS katz,
           CAST(rank AS INT) AS rank
    FROM (SELECT node, v,
                 row_number() OVER (ORDER BY v DESC, node) AS rank
          FROM x{_KATZ_ROUNDS})
    WHERE rank <= {_KATZ_TOP}
    """


@register(
    "graph_katz_centrality",
    oracle=_katz_oracle(),
    tags=("graph",),
)
def graph_katz_centrality(spark, sf_dir):
    """Katz centrality on the part co-occurrence graph, top-20 — the
    walk-counting centrality (x = Σ_k α^k A^k·1) that PageRank's
    damping approximates; bounded to {_KATZ_ROUNDS} terms like the
    registry's other iterative kernels so both engines run the same
    rounds.

    EXACT-INTEGER iteration (the PageRank float-drift problem
    engineered away): with α = 1/{_KATZ_INV_ALPHA}, track
    X_k = x_k·{_KATZ_INV_ALPHA}^k, giving the pure-integer recurrence
    X_(k+1)(v) = Σ_(u→v) X_k(u) + {_KATZ_INV_ALPHA}^(k+1) in
    DECIMAL(38,0) — bit-identical across engines and partitionings;
    ONE terminal float divide by {_KATZ_INV_ALPHA}^{_KATZ_ROUNDS}
    and a 6dp round. Ranking compares exact integers.

    Scale shape: each round is one edge⋈vector join + aggregate (the
    PageRank/label-prop shuffle), lineage-cut per round via
    localCheckpoint; top-20 is a heap (TakeOrdered), not a global
    sort. Edge generation is the shared order-key self-join."""
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    e = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")))
         .select(F.col("a.l_partkey").alias("u"),
                 F.col("b.l_partkey").alias("v"))
         .distinct())
    dirn = (e.select(F.col("u").alias("na"), F.col("v").alias("nb"))
            .unionAll(e.select(F.col("v").alias("na"),
                               F.col("u").alias("nb"))))
    dirn = dirn.localCheckpoint()
    dec = "decimal(38,0)"
    x = (dirn.select(F.col("na").alias("node")).distinct()
         .withColumn("v", F.lit(1).cast(dec))
         .localCheckpoint())
    for i in range(_KATZ_ROUNDS):
        scale = _KATZ_INV_ALPHA ** (i + 1)
        x = (dirn.join(x.withColumnRenamed("node", "na"), "na")
             .groupBy(F.col("nb").alias("node"))
             .agg((F.sum("v") + F.lit(scale)).cast(dec).alias("v"))
             .localCheckpoint())
    w = Window.orderBy(F.col("v").desc(), "node")
    final_scale = _KATZ_INV_ALPHA ** _KATZ_ROUNDS
    return (x.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _KATZ_TOP)
            .select("node",
                    F.round(F.col("v").cast("double") / final_scale, 6)
                    .alias("katz"),
                    F.col("rank").cast("int").alias("rank")))


# ------------------------------------------------ Hodges-Lehmann shift

_HL_BASE = "1-URGENT"


@register(
    "stat_hodges_lehmann_shift",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS pri,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS mo,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    p AS (
      SELECT b.pri, b.cents - a.cents AS diff,
             a.mo AS mi, b.mo AS mj
      FROM m a JOIN m b
        ON a.pri = '{_HL_BASE}' AND b.pri <> '{_HL_BASE}'),
    r AS (
      SELECT pri, diff,
             row_number() OVER (PARTITION BY pri
                                ORDER BY diff, mi, mj) AS rn,
             count(*) OVER (PARTITION BY pri) AS n
      FROM p)
    SELECT pri, CAST(max(n) AS BIGINT) AS n_pairs,
           round(avg(CAST(diff AS DOUBLE)) / 100.0, 4) AS hl_shift
    FROM r
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY pri
    """,
    tags=("stats",),
)
def stat_hodges_lehmann_shift(spark, sf_dir):
    """Hodges-Lehmann shift estimator of each priority's monthly
    revenue vs the {_HL_BASE} baseline: the MEDIAN of all cross
    pairwise differences — the location-shift companion of the
    rank-sum test (`stat_mann_whitney_u`) and the robust sibling of
    a difference in means, immune to the outlier months.

    Pair volume is quadratic in MONTHS (time-range constant, ~80² per
    priority), never in rows — the fact stream collapses to the
    monthly grain first (the Theil-Sen discipline). Differences are
    exact integers (cents); the median is an exact order statistic
    via row_number with a full (diff, mi, mj) tiebreak, averaging the
    two middle elements on even counts — a two-operand sum, not an
    accumulation."""
    m = (table(spark, sf_dir, "orders")
         .groupBy(F.col("o_orderpriority").alias("pri"),
                  (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                  .cast("long").alias("mo"))
         .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .alias("cents")))
    base = (m.filter(F.col("pri") == _HL_BASE)
            .select(F.col("mo").alias("mi"), F.col("cents").alias("ca")))
    rest = (m.filter(F.col("pri") != _HL_BASE)
            .select("pri", F.col("mo").alias("mj"),
                    F.col("cents").alias("cb")))
    p = (rest.crossJoin(F.broadcast(base))
         .select("pri", (F.col("cb") - F.col("ca")).alias("diff"),
                 "mi", "mj"))
    wr = Window.partitionBy("pri").orderBy("diff", "mi", "mj")
    wn = Window.partitionBy("pri")
    r = p.select("pri", "diff",
                 F.row_number().over(wr).alias("rn"),
                 F.count("*").over(wn).alias("n"))
    mid = r.filter((F.col("rn") == F.expr("(n + 1) div 2"))
                   | (F.col("rn") == F.expr("(n + 2) div 2")))
    return (mid.groupBy("pri")
            .agg(F.max("n").cast("long").alias("n_pairs"),
                 F.round(F.avg(F.col("diff").cast("double")) / 100.0, 4)
                 .alias("hl_shift")))
