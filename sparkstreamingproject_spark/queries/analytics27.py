"""Round-7 continued unfreeze, wave 3: exponential time-decay
attribution (completing the attribution family: last-touch / linear /
Markov-removal / time-decay), OHLC bar downsampling (the candlestick
resample every tick-series engine ships), and dynamic-time-warping
series distance (the classic elastic time-series measure beside the
registry's lock-step Pearson ``ts_pattern_similarity_search``).

Float discipline: attribution credit and DTW cost are pure integer
(power-of-two decay weights via bit shifts, truncating basis-point
division, cent-valued |difference| path sums); OHLC bars are integer
cents/quantities with deterministic first/last tie-breaks. The only
floats are terminal round()s shared verbatim by both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

_US_1D = 24 * 3600 * 1_000_000
_US_7D = 7 * _US_1D


# ------------------------------------------- time-decay attribution

@register(
    "events_attribution_time_decay",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
               FROM events),
    p AS (SELECT user_id, us, event_id FROM e
          WHERE event_type = 'purchase'),
    t AS (SELECT p.event_id AS pid, e2.event_type AS touch,
                 CAST(1 << CAST(7 - (p.us - e2.us) // {_US_1D} AS INT)
                      AS BIGINT) AS w
          FROM p JOIN e e2 ON e2.user_id = p.user_id
                          AND e2.us < p.us
                          AND p.us - e2.us <= {_US_7D}
                          AND e2.event_type <> 'purchase'),
    k AS (SELECT pid, CAST(sum(w) AS BIGINT) AS sw FROM t
          GROUP BY pid),
    credit AS (SELECT t.touch AS attributed_to,
                      CAST((10000 * t.w) // k.sw AS BIGINT) AS bp
               FROM t JOIN k USING (pid)
               UNION ALL
               SELECT 'organic', CAST(10000 AS BIGINT)
               FROM p LEFT JOIN k ON k.pid = p.event_id
               WHERE k.pid IS NULL)
    SELECT attributed_to, CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(bp) AS BIGINT) AS credit_bp
    FROM credit GROUP BY 1
    """,
    tags=("events", "analytics", "join"),
)
def events_attribution_time_decay(spark, sf_dir):
    """Exponential time-decay multi-touch attribution: each purchase
    splits 10000 credit basis points across its prior-7-day touches
    proportionally to a half-life-of-one-day decay weight — a touch
    aged d whole days carries weight 2^(7-d) (128 for same-day down to
    1 at exactly 7 days), so recency dominates but every touch in the
    window earns credit. Weights are exact powers of two (bit shifts)
    and the split is truncating integer division, so the whole model
    is bit-exact in any engine; touchless purchases credit 'organic'.

    Same scale shape as the driver-checked ``events_attribution_linear``
    (a user-keyed interval join bounded by per-user activity — never a
    cross join) plus one map-side-combinable per-purchase weight sum."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id",
        "event_type")
    p = (e.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("us").alias("pus"),
                 F.col("event_id").alias("pid")))
    t = (p.join(e, "user_id")
         .filter((F.col("us") < F.col("pus"))
                 & (F.col("pus") - F.col("us") <= _US_7D)
                 & (F.col("event_type") != "purchase"))
         .select("pid", F.col("event_type").alias("touch"),
                 F.expr(f"CAST(shiftleft(1, CAST(7 - (pus - us) div {_US_1D}"
                        " AS INT)) AS BIGINT)").alias("w")))
    k = t.groupBy("pid").agg(F.sum("w").alias("sw"))
    credit = (t.join(k, "pid")
              .select(F.col("touch").alias("attributed_to"),
                      F.expr("(10000 * w) div sw").cast("bigint").alias("bp"))
              .unionAll(
                  p.join(k, "pid", "left_anti")
                  .select(F.lit("organic").alias("attributed_to"),
                          F.lit(10000).cast("bigint").alias("bp"))))
    return (credit.groupBy("attributed_to")
            .agg(F.count("*").alias("n_touches"),
                 F.sum("bp").alias("credit_bp")))


# ------------------------------------------------------- OHLC bars

def lineitem_ticks(spark, sf_dir):
    """The lineitem tick stream shaped for bar aggregation: (brand,
    bar, cents, qty, tick) with the unique total-order key ``tick`` =
    (shipdate, orderkey, linenumber). Shared by the batch query and
    the streaming bar-maintenance fold."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(datediff(l_shipdate, DATE '1995-01-01') div 7 AS INT)")
        .alias("bar"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
        F.struct(F.col("l_shipdate").alias("d"),
                 F.col("l_orderkey").alias("ok"),
                 F.col("l_linenumber").alias("ln")).alias("tick"))
    brand = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand"))
    return li.join(F.broadcast(brand), "l_partkey").drop("l_partkey")


def tick_bars(ticks: "F.DataFrame"):
    """Per-(brand, bar) MERGEABLE bar partials: open/close carry their
    tie-break keys as ``min(struct(tick, cents))`` / ``max(...)`` —
    associative, so partials from any split of the ticks (map-side
    combine, micro-batches) merge to the same bar. The unique tick key
    makes struct-min equivalent to ``min_by(cents, tick)``."""
    return (ticks.groupBy("brand", "bar")
            .agg(F.min(F.struct("tick", "cents")).alias("o"),
                 F.max(F.struct("tick", "cents")).alias("c"),
                 F.max("cents").alias("high_cents"),
                 F.min("cents").alias("low_cents"),
                 F.sum("qty").alias("volume"),
                 F.count("*").cast("long").alias("n_ticks")))


def merge_bars(bars: "F.DataFrame"):
    """Fold a union of bar partials down to one row per (brand, bar) —
    the same associative merges ``tick_bars`` uses."""
    return (bars.groupBy("brand", "bar")
            .agg(F.min("o").alias("o"), F.max("c").alias("c"),
                 F.max("high_cents").alias("high_cents"),
                 F.min("low_cents").alias("low_cents"),
                 F.sum("volume").alias("volume"),
                 F.sum("n_ticks").alias("n_ticks")))


def finalize_bars(bars: "F.DataFrame"):
    """Drop the tie-break keys: the user-facing OHLC schema."""
    return bars.select("brand", "bar",
                       F.col("o.cents").alias("open_cents"),
                       F.col("c.cents").alias("close_cents"),
                       "high_cents", "low_cents", "volume", "n_ticks")


@register(
    "ts_ohlc_bars",
    oracle="""
    WITH t AS (
      SELECT p.p_brand AS brand,
             CAST(datediff('day', DATE '1995-01-01', l.l_shipdate) // 7
                  AS INT) AS bar,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l.l_quantity) AS BIGINT) AS qty,
             l.l_shipdate AS d, l.l_orderkey AS ok, l.l_linenumber AS ln
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY brand, bar
                                ORDER BY d, ok, ln) AS rf,
             row_number() OVER (PARTITION BY brand, bar
                                ORDER BY d DESC, ok DESC, ln DESC) AS rl
      FROM t)
    SELECT brand, bar,
           CAST(max(CASE WHEN rf = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           CAST(max(CASE WHEN rl = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(sum(qty) AS BIGINT) AS volume,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY 1, 2
    """,
    tags=("timeseries", "agg"),
)
def ts_ohlc_bars(spark, sf_dir):
    """OHLC candlestick downsampling: weekly price bars per part brand
    over the lineitem tick stream — open/close are the first/last
    extended price under the total tick order (shipdate, orderkey,
    linenumber — unique, so the bars are deterministic), high/low are
    extrema, volume is total quantity. The resample every tick-store
    ships (ts_multi_grain_rollup's additive sibling cannot express
    first/last).

    Scale shape: ONE hash aggregation on (brand, bar) carrying
    (tick-key, price) struct extrema — map-side combinable, no window
    over the fact table (the oracle states the same bars via per-bar
    row_number, the readable but single-pass-unfriendly form). The
    part join is dimension-side and broadcast-eligible. The same
    mergeable partials power ``streaming/ohlc_maintain.py``."""
    return finalize_bars(tick_bars(lineitem_ticks(spark, sf_dir)))


# ------------------------------------------- dynamic time warping

#: unreachable-cell sentinel — far above any real path cost
#: (path length <= n+m <= 62 steps of cent-valued diffs) yet with
#: 2^63/2^60 = 8x headroom against int64 even if one boundary cell
#: is selected and added to a real cost once.
_DTW_INF = 1 << 60


def _dtw_oracle() -> str:
    return f"""
    WITH RECURSIVE
    rev AS (
      SELECT n.n_name AS nation,
             datediff('day', DATE '1995-01-01', o.o_orderdate) AS day,
             CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1995-02-01'
      GROUP BY 1, 2),
    base AS (SELECT nation, list(cents ORDER BY day) AS a
             FROM rev GROUP BY 1),
    ref AS (SELECT a AS b FROM base
            ORDER BY len(a) DESC, nation LIMIT 1),
    pairs AS (SELECT nation, a, b, len(a) AS n, len(b) AS m
              FROM base, ref),
    dp AS (
      SELECT nation, a, b, n, m, 1 AS i, 0 AS j,
             [CAST(0 AS BIGINT)]
               || list_transform(range(m + 1),
                                 x -> CAST({_DTW_INF} AS BIGINT)) AS buf
      FROM pairs
      UNION ALL
      SELECT nation, a, b, n, m,
             CASE WHEN j = m THEN i + 1 ELSE i END,
             CASE WHEN j = m THEN 0 ELSE j + 1 END,
             list_append(buf[2:],
               CASE WHEN j = m THEN CAST({_DTW_INF} AS BIGINT)
                    ELSE abs(a[i] - b[j + 1])
                         + least(buf[1], buf[2], buf[m + 2])
               END)
      FROM dp WHERE NOT (i = n AND j = m))
    SELECT nation, CAST(n AS BIGINT) AS n_days,
           CAST(buf[m + 2] AS BIGINT) AS dtw_cents,
           round(buf[m + 2] / (100.0 * (n + m)), 2) AS dtw_per_step
    FROM dp WHERE i = n AND j = m
    """


@register(
    "ts_dtw_distance",
    oracle=_dtw_oracle(),
    tags=("timeseries", "similarity", "iterative"),
)
def ts_dtw_distance(spark, sf_dir):
    """Dynamic-time-warping distance from every nation's January-1995
    daily revenue series to the densest nation's series (ties broken
    by name) — the classic elastic measure that aligns series of
    DIFFERENT lengths and tolerates local time shifts, where the
    registry's ``ts_pattern_similarity_search`` Pearson windows are
    strictly lock-step. The reference row scores 0 against itself (a
    built-in invariant the test pins).

    Exactness: series values are integer cents, cell costs are integer
    |differences|, boundary cells are a 2^60 sentinel (never on a real
    path; 8x int64 headroom) — the full DP is integer arithmetic, so
    Spark's nested ``aggregate`` fold and the oracle's rolling-buffer
    recursive CTE produce bit-identical costs.

    Scale shape: the fact scan reduces to one row per (nation, day)
    before anything quadratic; the DP runs per PAIR on two in-row
    arrays (month-bounded, <=31 elements) inside whole-stage codegen —
    at a million series the pair relation is what grows, never the
    per-pair state. The reference series is a one-row broadcast."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-02-01"))
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    nat = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"))
    rev = (o.join(F.broadcast(cust.join(F.broadcast(nat), "c_nationkey")),
                  "o_custkey")
           .groupBy("nation",
                    F.expr("datediff(o_orderdate, DATE '1995-01-01')")
                    .alias("day"))
           .agg(F.expr("CAST(sum(round(o_totalprice * 100)) AS BIGINT)")
                .alias("cents")))
    base = (rev.groupBy("nation")
            .agg(F.expr("transform(array_sort(collect_list(struct(day, "
                        "cents))), x -> x.cents)").alias("a")))
    ref = (base.orderBy(F.size("a").desc(), "nation").limit(1)
           .select(F.col("a").alias("b")))
    pairs = (base.crossJoin(F.broadcast(ref))
             .withColumn("n", F.size("a"))
             .withColumn("m", F.size("b")))
    dtw = F.expr(f"""
      element_at(
        aggregate(
          a,
          concat(array(CAST(0 AS BIGINT)),
                 array_repeat(CAST({_DTW_INF} AS BIGINT), m)),
          (prev, ai) -> aggregate(
            sequence(1, m),
            array(CAST({_DTW_INF} AS BIGINT)),
            (row, j) -> array_append(row,
              abs(ai - element_at(b, j))
              + least(element_at(row, -1),
                      element_at(prev, j + 1),
                      element_at(prev, j))))),
        m + 1)
    """)
    return (pairs.withColumn("dtw_cents", dtw)
            .select("nation", F.col("n").cast("long").alias("n_days"),
                    "dtw_cents",
                    F.round(F.col("dtw_cents")
                            / (100.0 * (F.col("n") + F.col("m"))), 2)
                    .alias("dtw_per_step")))


# ------------------------------------------------ CUSUM changepoint

#: offline single-changepoint statistic: T_t = N*S_t - t*X (the
#: integer-cleared form of S_t - t*mean), maximized over 1 <= t < N


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    seq AS (
      SELECT event_type, day, x,
             row_number() OVER w AS t,
             CAST(sum(x) OVER w AS BIGINT) AS s,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT)
               AS tot
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING)),
    stat AS (
      SELECT event_type, day, t, s, n, tot,
             abs(n * s - t * tot) AS abs_t
      FROM seq WHERE t < n),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs_t DESC, day) AS rk
        FROM stat) WHERE rk = 1)
    SELECT event_type, CAST(day AS BIGINT) AS cp_day,
           CAST(t AS BIGINT) AS cp_t, CAST(abs_t AS BIGINT) AS abs_t,
           CAST(s * 1000000 // t AS BIGINT) AS mean_before_e6,
           CAST((tot - s) * 1000000 // (n - t) AS BIGINT)
             AS mean_after_e6
    FROM best
    """,
    tags=("timeseries", "stat"),
)
def events_cusum_changepoint(spark, sf_dir):
    """Offline CUSUM changepoint detection per event-type daily-count
    series (binary segmentation's first split; the offline argmax
    member of the change-detection family beside the one-sided
    sequential `ts_cusum_nation_drift` and the rank-based
    `ts_changepoint_pettitt`): the classic statistic
    max_t |S_t - t*mean| in its integer-cleared form
    |N*S_t - t*X| (S_t = prefix sum, X = series total, N = days), so
    the argmax — and the reported before/after level means (e6-scaled
    truncating ratios) — are exact integers with deterministic
    earliest-day tiebreak. No floats anywhere.

    Scale shape: one day-grain pre-aggregate (map-side combinable),
    then prefix sums windowed PER SERIES — the window partition is the
    series key, never global, and the series length is calendar-
    bounded regardless of event volume. At 1e9 daily counts N*S_t
    stays under 2^63 for day counts x totals < 9e18; the e6 means are
    the only scaled divisions."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        (F.unix_micros("ts") / 86_400_000_000)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("x")))
    w = (W.partitionBy("event_type").orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    wp = W.partitionBy("event_type")
    seq = daily.select(
        "event_type", "day", "x",
        F.row_number().over(W.partitionBy("event_type")
                            .orderBy("day")).alias("t"),
        F.sum("x").over(w).cast("long").alias("s"),
        F.count("*").over(wp).cast("long").alias("n"),
        F.sum("x").over(wp).cast("long").alias("tot"))
    stat = (seq.filter(F.col("t") < F.col("n"))
            .withColumn("abs_t", F.abs(F.col("n") * F.col("s")
                                       - F.col("t") * F.col("tot"))))
    rk = W.partitionBy("event_type").orderBy(F.desc("abs_t"), "day")
    return (stat.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").cast("long")
                    .alias("cp_day"),
                    F.col("t").cast("long").alias("cp_t"),
                    F.col("abs_t").cast("long").alias("abs_t"),
                    F.expr("CAST(s * 1000000 div t AS BIGINT)")
                    .alias("mean_before_e6"),
                    F.expr("CAST((tot - s) * 1000000 div (n - t)"
                           " AS BIGINT)").alias("mean_after_e6")))


# ------------------------------------------- forecast-baseline eval


@register(
    "ts_seasonal_naive_mase",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, day, x,
             lag(x, 1) OVER w AS x1,
             lag(x, 7) OVER w AS x7
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    err AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_scored,
             CAST(sum(abs(x - x1)) AS BIGINT) AS sae_naive,
             CAST(sum(abs(x - x7)) AS BIGINT) AS sae_snaive
      FROM lagged WHERE x7 IS NOT NULL GROUP BY 1)
    SELECT event_type, n_scored, sae_naive, sae_snaive,
           CAST(sae_snaive * 1000000 // sae_naive AS BIGINT)
             AS mase_e6
    FROM err
    """,
    tags=("timeseries", "stat", "eval"),
)
def ts_seasonal_naive_mase(spark, sf_dir):
    """Forecast-baseline evaluation per event-type daily series (the
    MASE companion of `ts_seasonal_naive_backtest`, which scores the
    same forecast by MAE/WAPE without the naive-scale ratio): MASE
    of the weekly seasonal-naive forecast (x-hat_t = x_{t-7}) against
    the naive in-sample scale (x-hat_t = x_{t-1}), both scored over
    the same days (those with a t-7 history, so the two error sums
    are comparable). mase_e6 < 1e6 means weekly seasonality carries
    real signal — the go/no-go gate a forecasting pipeline runs
    before fitting anything heavier. Absolute-error sums are exact
    BIGINTs; the ratio is one e6-scaled truncating division.

    Scale shape: day-grain pre-aggregate, two lag windows PER SERIES
    (calendar-bounded), one per-series aggregate — no global stages
    at any volume."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        (F.unix_micros("ts") / 86_400_000_000)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("x")))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"))
    err = (lagged.filter(F.col("x7").isNotNull())
           .groupBy("event_type")
           .agg(F.count("*").alias("n_scored"),
                F.sum(F.abs(F.col("x") - F.col("x1"))).cast("long")
                .alias("sae_naive"),
                F.sum(F.abs(F.col("x") - F.col("x7"))).cast("long")
                .alias("sae_snaive")))
    return err.select(
        "event_type", "n_scored", "sae_naive", "sae_snaive",
        F.expr("CAST(sae_snaive * 1000000 div sae_naive AS BIGINT)")
        .alias("mase_e6"))


# --------------------------------------------- linear-interp resample


@register(
    "ts_resample_linear_interp",
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM hourly),
    grid AS (SELECT t.event_type, g.h AS hour
             FROM (SELECT DISTINCT event_type FROM hourly) t
             CROSS JOIN (SELECT unnest(range(h0, h1 + 1)) AS h
                         FROM span) g),
    j AS (SELECT g.event_type, g.hour, d.cents
          FROM grid g LEFT JOIN hourly d USING (event_type, hour)),
    fb AS (
      SELECT event_type, hour, cents,
             max(CASE WHEN cents IS NOT NULL THEN hour END)
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS UNBOUNDED PRECEDING) AS ph,
             min(CASE WHEN cents IS NOT NULL THEN hour END)
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING) AS nh
      FROM j),
    vals AS (
      SELECT f.event_type, f.hour, f.cents, f.ph, f.nh,
             pv.cents AS pc, nv.cents AS nc
      FROM fb f
      LEFT JOIN hourly pv ON pv.event_type = f.event_type
                         AND pv.hour = f.ph
      LEFT JOIN hourly nv ON nv.event_type = f.event_type
                         AND nv.hour = f.nh)
    SELECT event_type, CAST(hour AS BIGINT) AS hour,
           CAST(CASE
             WHEN cents IS NOT NULL THEN cents
             WHEN ph IS NULL THEN nc
             WHEN nh IS NULL THEN pc
             ELSE pc + (nc - pc) * (hour - ph) // (nh - ph)
           END AS BIGINT) AS cents_interp,
           CAST(CASE WHEN cents IS NOT NULL THEN 0 ELSE 1 END AS INT)
             AS interpolated
    FROM vals
    """,
    tags=("timeseries",),
)
def ts_resample_linear_interp(spark, sf_dir):
    """Gap-filling resample with LINEAR interpolation — the companion
    of `ts_resample_ffill` (carry-forward) for quantities where a
    straight line between surrounding observations is the honest fill
    (sensor sums, balances). Each missing hour takes
    pc + (nc-pc)*(hour-ph) div (nh-ph) between its previous/next
    observed hours (exact truncating integer in cents — no float
    slope); leading/trailing gaps degenerate to nearest-value fill.
    The `interpolated` flag marks synthetic rows for downstream
    weighting. HOUR grain, because the fixture's daily series are
    gap-free at every SF — hourly series have real gaps at
    sf0.001/sf0.01, so the interpolation branch is exercised where
    the driver checks.

    Scale shape: the prev/next observed-hour markers are two
    frame-bounded windows PER SERIES (the ffill pattern run both
    directions); value lookup is two hash joins back to the
    hour-grain aggregate keyed by (series, hour). Grid size is
    series x hours — calendar-bounded, volume-independent."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = (ev.filter(F.col("value").isNotNull())
              .groupBy("event_type",
                       (F.unix_micros("ts") / 3_600_000_000)
                       .cast("long").alias("hour"))
              .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                   .cast("long").alias("cents")))
    span = hourly.agg(F.min("hour").alias("h0"),
                      F.max("hour").alias("h1"))
    grid = (hourly.select("event_type").distinct()
            .crossJoin(F.broadcast(span))
            .select("event_type",
                    F.explode(F.sequence("h0", "h1")).alias("hour")))
    j = grid.join(hourly, ["event_type", "hour"], "left")
    wf = (W.partitionBy("event_type").orderBy("hour")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wb = (W.partitionBy("event_type").orderBy("hour")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    fb = j.select(
        "event_type", "hour", "cents",
        F.max(F.when(F.col("cents").isNotNull(), F.col("hour")))
        .over(wf).alias("ph"),
        F.min(F.when(F.col("cents").isNotNull(), F.col("hour")))
        .over(wb).alias("nh"))
    pv = hourly.select("event_type", F.col("hour").alias("ph"),
                       F.col("cents").alias("pc"))
    nv = hourly.select("event_type", F.col("hour").alias("nh"),
                       F.col("cents").alias("nc"))
    vals = (fb.join(pv, ["event_type", "ph"], "left")
            .join(nv, ["event_type", "nh"], "left"))
    fill = (F.when(F.col("cents").isNotNull(), F.col("cents"))
            .when(F.col("ph").isNull(), F.col("nc"))
            .when(F.col("nh").isNull(), F.col("pc"))
            .otherwise(F.expr(
                "pc + (nc - pc) * (hour - ph) div (nh - ph)")))
    return vals.select(
        "event_type", F.col("hour").cast("long").alias("hour"),
        fill.cast("long").alias("cents_interp"),
        F.when(F.col("cents").isNotNull(), 0).otherwise(1)
        .cast("int").alias("interpolated"))
