"""Round-5 wave 2: skyline (Pareto-frontier) selection and rolling
ordinary-least-squares trend — two classic analytics operators the
engine lacked.

Float discipline: prices are exact cents (``round(x*100)`` BIGINT),
the skyline test is pure integer comparison, and the rolling slope is
an exact-integer least-squares ratio emitted via truncating integer
division (both engines truncate toward zero) — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

#: fixed-point scale for the rolling OLS slope (cents/day -> 1e-4)
_SLOPE_SCALE = 10_000


@register(
    "skyline_price_size",
    oracle="""
    WITH pts AS (SELECT DISTINCT
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                   CAST(p_size AS BIGINT) AS size
                 FROM part),
    sky AS (SELECT cents, size,
                   min(size) OVER (ORDER BY cents, size
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min
            FROM pts)
    SELECT p.p_partkey, s.cents, s.size
    FROM (SELECT cents, size FROM sky
          WHERE prev_min IS NULL OR size < prev_min) s
    JOIN (SELECT p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                 CAST(p_size AS BIGINT) AS size
          FROM part) p USING (cents, size)
    """,
    tags=("analytics", "window"),
)
def skyline_price_size(spark, sf_dir):
    """Skyline / Pareto frontier: parts where no other part is both
    cheaper-or-equal and smaller-or-equal (strict somewhere) — the
    classic multi-objective shortlist operator.

    Plan: NOT the textbook O(n²) dominance anti-join. Sorted by
    (price, size), a point is dominated iff some earlier point has
    size <= its size, so one window pass with an EXCLUSIVE running min
    decides the frontier in O(n log n). The window runs over DISTINCT
    (price, size) points — dimension-bounded, far smaller than the
    table — and a hash join fans the surviving points back out to part
    rows. Integer cents/sizes: bit-exact in any engine."""
    part = table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    keyed = part.select("p_partkey", cents.alias("cents"),
                        F.col("p_size").cast("bigint").alias("size"))
    pts = keyed.select("cents", "size").distinct()
    w = (Window.partitionBy(F.lit(1)).orderBy("cents", "size")
         .rowsBetween(Window.unboundedPreceding, -1))
    sky = (pts.withColumn("prev_min", F.min("size").over(w))
           .filter(F.col("prev_min").isNull()
                   | (F.col("size") < F.col("prev_min")))
           .select("cents", "size"))
    return keyed.join(sky, ["cents", "size"]).select("p_partkey",
                                                     "cents", "size")


@register(
    "rolling_ols_slope_30d",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name, o.o_orderdate AS d,
             datediff('day', DATE '1992-01-01', o.o_orderdate) AS x,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3),
    win AS (
      SELECT n_name, d,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(cents) OVER w AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * cents) OVER w AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx
      FROM rev
      WINDOW w AS (PARTITION BY n_name ORDER BY x
                   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW))
    SELECT n_name, d, n,
           CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * {_SLOPE_SCALE}
                // (n * sxx - sx * sx) AS BIGINT) AS slope_sc
    FROM win WHERE n >= 2
    """,
    tags=("analytics", "timeseries", "window"),
)
def rolling_ols_slope_30d(spark, sf_dir):
    """Rolling 30-day least-squares revenue trend per nation — the
    windowed generalization of stat_linear_trend (one global fit).
    Five windowed sums (n, Σx, Σy, Σxy, Σx²) over a RANGE frame keyed
    on day index give the closed-form slope; partitioned by nation, so
    the window parallelizes across the natural key at any scale.
    All accumulators are exact integers (day index × cents); the slope
    ships as a scaled truncating integer ratio — both engines truncate
    toward zero, so the value is bit-exact. The Σxy accumulator and
    the n·Σxy − Σx·Σy numerator run in 128-bit integers
    (DECIMAL(38,0) here, HUGEINT in the oracle): cents-scale revenue
    × day index squares past int64 once daily-nation revenue nears
    1e16 cents, and Spark (ANSI off) would wrap silently while DuckDB
    raised — the class of silent scale divergence this repo bans.
    The denominator stays int64 (n ≤ 30, x ≤ calendar days: ≤ ~6e9
    forever)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev = (o.join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy("n_name", F.col("o_orderdate").alias("d"),
                    F.datediff("o_orderdate",
                               F.lit("1992-01-01")).alias("x"))
           .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                      .cast("bigint")).alias("cents")))
    w = (Window.partitionBy("n_name").orderBy("x")
         .rangeBetween(-29, Window.currentRow))
    win = rev.select(
        "n_name", "d",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("cents"))
        .over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint")
        .alias("sxx"))
    return (win.filter(F.col("n") >= 2)
            .select("n_name", "d", "n",
                    F.expr(f"(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
                           f" * {_SLOPE_SCALE}"
                           f" div (n * sxx - sx * sx)")
                    .cast("bigint").alias("slope_sc")))
