"""Round-4 continuation, wave 2 (round-5 driver-window candidates):
data-quality expectations, incremental aggregate maintenance, seasonal
decomposition, winsorized robust statistics, blocked fuzzy matching.

Float discipline per queries/base.py: integer/DECIMAL accumulation for
everything that crosses partitions; float only in terminal fixed-arity
expressions over exact operands.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table


# ------------------------------------------- data-quality expectations

@register(
    "dq_expectations_report",
    oracle="""
    WITH uq AS (
      SELECT 'orders.o_orderkey unique' AS expectation,
             count(*) AS n_checked,
             count(*) - count(DISTINCT o_orderkey) AS n_violations
      FROM orders),
    fk AS (
      SELECT 'lineitem.l_orderkey fk orders' AS expectation,
             (SELECT count(*) FROM lineitem) AS n_checked,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations),
    rng AS (
      SELECT 'orders.o_totalprice in (0, 1e7]' AS expectation,
             count(*) AS n_checked,
             CAST(sum(CASE WHEN o_totalprice <= 0
                           OR o_totalprice > 1e7 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM orders),
    nn AS (
      SELECT 'customer.c_name not null' AS expectation,
             count(*) AS n_checked,
             count(*) - count(c_name) AS n_violations
      FROM customer),
    disc AS (
      SELECT 'lineitem.l_discount in [0, 0.5]' AS expectation,
             count(*) AS n_checked,
             CAST(sum(CASE WHEN l_discount < 0
                           OR l_discount > 0.5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM lineitem),
    acc AS (
      SELECT 'lineitem.l_shipdate >= order date' AS expectation,
             count(*) AS n_checked,
             CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT expectation, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT)
             AS passed
    FROM (SELECT * FROM uq UNION ALL SELECT * FROM fk
          UNION ALL SELECT * FROM rng UNION ALL SELECT * FROM nn
          UNION ALL SELECT * FROM disc UNION ALL SELECT * FROM acc)
    """,
    tags=("dq", "agg"),
)
def dq_expectations_report(spark, sf_dir):
    """Data-quality expectations suite — the dbt-test / Great-
    Expectations surface as ONE engine query: uniqueness, referential
    integrity, accepted ranges, not-null, and cross-table ordering
    invariants, each reported as (expectation, n_checked,
    n_violations, passed).

    Every expectation is a full-relation aggregate or an anti-join —
    the shapes the engine already optimizes (the FK check is a
    left-anti join that AQE broadcasts when the dim side is small; the
    ship-date check rides the fact-fact join's shuffle). Counts are
    all integers; nothing float anywhere. At 100 TB each check stays
    one scan; the final UNION ALL is six 1-row relations."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")

    def row(name, df):
        return df.select(F.lit(name).alias("expectation"),
                         F.col("n_checked").cast("long"),
                         F.col("n_violations").cast("long"))

    uq = row("orders.o_orderkey unique", o.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .alias("n_violations")))
    orphan = (li.join(o.select("o_orderkey"),
                      li.l_orderkey == o.o_orderkey, "left_anti")
              .agg(F.count("*").alias("n_violations")))
    fk = row("lineitem.l_orderkey fk orders",
             li.agg(F.count("*").alias("n_checked"))
             .crossJoin(F.broadcast(orphan)))
    rng = row("orders.o_totalprice in (0, 1e7]", o.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when((F.col("o_totalprice") <= 0)
                     | (F.col("o_totalprice") > 1e7), 1).otherwise(0))
        .alias("n_violations")))
    nn = row("customer.c_name not null", c.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.count("c_name")).alias("n_violations")))
    disc = row("lineitem.l_discount in [0, 0.5]", li.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when((F.col("l_discount") < 0)
                     | (F.col("l_discount") > 0.5), 1).otherwise(0))
        .alias("n_violations")))
    acc = row("lineitem.l_shipdate >= order date",
              li.join(o, li.l_orderkey == o.o_orderkey).agg(
                  F.count("*").alias("n_checked"),
                  F.sum(F.when(F.col("l_shipdate")
                               < F.col("o_orderdate"), 1).otherwise(0))
                  .alias("n_violations")))
    rep = uq.unionAll(fk).unionAll(rng).unionAll(nn).unionAll(disc) \
            .unionAll(acc)
    return rep.withColumn(
        "passed",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("int"))


# ------------------------------------- incremental aggregate merge

@register(
    "agg_incremental_merge",
    oracle="""
    WITH days AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    cutoff AS (SELECT max(day) - 30 AS cut FROM days),
    state AS (
      SELECT day, CAST(sum(cents) AS BIGINT) AS cents,
             count(*) AS n
      FROM days, cutoff WHERE day < cut GROUP BY day),
    delta AS (
      SELECT day, CAST(sum(cents) AS BIGINT) AS cents,
             count(*) AS n
      FROM days, cutoff WHERE day >= cut GROUP BY day),
    merged AS (
      SELECT coalesce(s.day, d.day) AS day,
             coalesce(s.cents, 0) + coalesce(d.cents, 0) AS cents,
             coalesce(s.n, 0) + coalesce(d.n, 0) AS n
      FROM state s FULL OUTER JOIN delta d ON s.day = d.day)
    SELECT day, CAST(n AS BIGINT) AS n_orders,
           round(cents / 100.0, 2) AS revenue
    FROM merged
    """,
    tags=("agg", "incremental", "scale"),
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental aggregate maintenance: an existing daily-revenue
    state (everything before a 30-day cutoff) merged with the freshly
    arrived delta partition via FULL OUTER join + additive combine —
    the pattern that keeps a 100 TB rollup current by touching only
    the new partition instead of recomputing history. The DuckDB
    oracle runs the same state⊕delta merge; the parity gate proves
    merge ≡ recompute because sums are associative over the split.

    Partial aggregates are exact integer cents (order-free); the
    merge is keyed on the day — at scale the state side is the
    persisted rollup table and the delta side is one partition, so
    the join is dimension-sized × tiny."""
    days = table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"))
    cut = days.agg((F.date_sub(F.max("day"), 30)).alias("cut"))
    d = days.crossJoin(F.broadcast(cut))
    state = (d.filter(F.col("day") < F.col("cut")).groupBy("day")
             .agg(F.sum("cents").alias("cents"), F.count("*").alias("n")))
    delta = (d.filter(F.col("day") >= F.col("cut")).groupBy("day")
             .agg(F.sum("cents").alias("cents"), F.count("*").alias("n")))
    s, dl = state.alias("s"), delta.alias("d")
    merged = (s.join(dl, F.col("s.day") == F.col("d.day"), "full_outer")
              .select(
                  F.coalesce(F.col("s.day"), F.col("d.day")).alias("day"),
                  (F.coalesce(F.col("s.cents"), F.lit(0))
                   + F.coalesce(F.col("d.cents"), F.lit(0))).alias("cents"),
                  (F.coalesce(F.col("s.n"), F.lit(0))
                   + F.coalesce(F.col("d.n"), F.lit(0))).alias("n")))
    return merged.select(
        "day", F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"))


# --------------------------------------------- seasonal decomposition

@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS x
      FROM events GROUP BY 1),
    tr AS (
      SELECT day, x,
             CASE WHEN count(*) OVER w = 7
                  THEN CAST(sum(x) OVER w AS BIGINT) END AS num
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                   AND 3 FOLLOWING)),
    se AS (
      SELECT day % 7 AS dow,
             CAST(sum(7 * x - num) AS BIGINT) AS s_num,
             7 * count(num) AS s_den
      FROM tr WHERE num IS NOT NULL GROUP BY 1)
    SELECT t.day, t.x,
           round(t.num / 7.0, 4) AS trend,
           round(s.s_num * 1.0 / s.s_den, 4) AS seasonal,
           round(t.x - t.num / 7.0 - s.s_num * 1.0 / s.s_den, 4)
             AS residual
    FROM tr t JOIN se s ON t.day % 7 = s.dow
    WHERE t.num IS NOT NULL
    """,
    tags=("timeseries", "stats", "window"),
)
def ts_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of daily event volume
    — trend (centered 7-day moving average), day-of-week seasonal
    component (mean detrended value per weekday), residual — the
    moving-average core of STL without the loess pass.

    Exactness: the trend numerator is an integer 7-day window sum
    (full windows only); the seasonal numerator Σ(7x−num) stays
    integer by scaling through the window width, so NO float mean is
    ever accumulated — trend, seasonal, and residual are each one
    terminal division over exact integers, bit-identical under any
    partitioning. Weekday = epoch-day % 7 (timezone-free). The
    ordered window runs over the daily aggregate; the seasonal join
    is 7 rows broadcast."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.floor(F.unix_micros("ts") / 86_400_000_000)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("x")))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day", "x",
        F.when(F.count("*").over(w) == 7, F.sum("x").over(w))
        .alias("num"))
    se = (tr.filter(F.col("num").isNotNull())
          .groupBy((F.col("day") % 7).alias("dow"))
          .agg(F.sum(7 * F.col("x") - F.col("num")).alias("s_num"),
               (7 * F.count("num")).alias("s_den")))
    t = tr.filter(F.col("num").isNotNull())
    j = t.join(F.broadcast(se), t.day % 7 == se.dow)
    return j.select(
        "day", "x",
        F.round(F.col("num") / 7.0, 4).alias("trend"),
        F.round(F.col("s_num") * 1.0 / F.col("s_den"), 4)
        .alias("seasonal"),
        F.round(F.col("x") - F.col("num") / 7.0
                - F.col("s_num") * 1.0 / F.col("s_den"), 4)
        .alias("residual"))


# ------------------------------------------------ winsorized stats

@register(
    "agg_winsorized_stats",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    b AS (
      SELECT event_type,
             max(CASE WHEN rn = greatest((n * 5) // 100, 1)
                      THEN cents END) AS lo,
             max(CASE WHEN rn = least((n * 95) // 100 + 1, n)
                      THEN cents END) AS hi
      FROM r GROUP BY event_type),
    c AS (
      SELECT r.event_type,
             least(greatest(r.cents, b.lo), b.hi) AS w,
             r.n
      FROM r JOIN b ON r.event_type = b.event_type)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           round(CAST(sum(w) AS BIGINT) / max(n) / 100.0, 4)
             AS wins_mean,
           round(sqrt(CAST(max(n) * sum(w * w) - sum(w) * sum(w)
                           AS DOUBLE)
                      / (max(n) * (max(n) - 1.0))) / 100.0, 4)
             AS wins_std
    FROM c GROUP BY event_type
    """,
    tags=("stats", "agg"),
)
def agg_winsorized_stats(spark, sf_dir):
    """Winsorized mean and standard deviation of event value per
    event type: clip at the exact 5th/95th percentile order
    statistics, then aggregate — the robust-stats companion to the
    IQR/MAD outlier screens (`events_value_outliers_iqr`,
    `events_outliers_mad`) that reports the stats a pipeline would
    actually train thresholds on.

    Values quantize to integer cents up front; percentile bounds are
    exact order statistics picked by row_number (full tiebreak on the
    value itself — duplicate cents make any of the tied rows the same
    bound); clipped sums and sum-of-squares accumulate as exact
    integers, so mean and the (n·Σw²−(Σw)²)/(n(n−1)) variance are
    single terminal float expressions. One window + two hash
    aggregates, all partitioned by the group key."""
    v = (table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull())
         .select("event_type",
                 F.expr("CAST(round(value * 100) AS BIGINT)")
                 .alias("cents")))
    wr = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    r = v.select("event_type", "cents",
                 F.row_number().over(wr).alias("rn"),
                 F.count("*").over(wn).alias("n"))
    b = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn")
                     == F.greatest(F.expr("(n * 5) div 100"), F.lit(1)),
                     F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn")
                     == F.least(F.expr("(n * 95) div 100 + 1"),
                                F.col("n")),
                     F.col("cents"))).alias("hi"))
    c = (r.join(F.broadcast(b), "event_type")
         .select("event_type",
                 F.least(F.greatest(F.col("cents"), F.col("lo")),
                         F.col("hi")).alias("w"),
                 "n"))
    n_ = F.max("n")
    sw = F.sum("w")
    # Σw² passes int64 once an event type holds ~1e9 rows (w ≤ 1e5
    # cents after the clip): accumulate in DECIMAL(38,0) — the bigint
    # sum would wrap SILENTLY before the decimal casts below (DuckDB's
    # sum is HUGEINT-backed and cannot wrap, so no oracle change)
    sww = F.sum(F.col("w").cast("decimal(38,0)") * F.col("w"))
    return c.groupBy("event_type").agg(
        n_.cast("long").alias("n_events"),
        F.round(sw / n_ / 100.0, 4).alias("wins_mean"),
        F.round(F.sqrt((n_.cast("decimal(38,0)") * sww.cast("decimal(38,0)")
                        - sw.cast("decimal(38,0)") * sw.cast("decimal(38,0)"))
                       .cast("double")
                       / (n_ * (n_ - 1.0))) / 100.0, 4)
        .alias("wins_std"))


# --------------------------------------------- blocked fuzzy join

@register(
    "join_fuzzy_blocked",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    probes AS (
      SELECT p_partkey AS probe_id,
             substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
             || substr(p_name,
                       CAST(p_partkey % length(p_name) AS INT) + 2)
               AS probe
      FROM part),
    b1 AS (
      SELECT p.probe_id, p.probe, n.p_name
      FROM probes p JOIN names n
        ON substr(p.probe, 1, 1) = substr(n.p_name, 1, 1)
       AND abs(length(p.probe) - length(n.p_name)) <= 1),
    b2 AS (
      SELECT p.probe_id, p.probe, n.p_name
      FROM probes p JOIN names n
        ON substr(p.probe, length(p.probe), 1)
           = substr(n.p_name, length(n.p_name), 1)
       AND abs(length(p.probe) - length(n.p_name)) <= 1),
    cand AS (SELECT * FROM b1 UNION SELECT * FROM b2),
    m AS (
      SELECT probe_id, probe, p_name,
             levenshtein(probe, p_name) AS dist
      FROM cand WHERE levenshtein(probe, p_name) <= 1)
    SELECT probe_id, probe,
           min(p_name) AS matched_name,
           CAST(min(dist) AS INT) AS dist,
           count(*) AS n_candidates
    FROM m GROUP BY probe_id, probe
    """,
    tags=("join", "text", "scale"),
)
def join_fuzzy_blocked(spark, sf_dir):
    """Blocked fuzzy join (record linkage): corrupted probe names
    (one deterministic character deletion per part name) matched back
    to the clean name dictionary under edit distance ≤ 1 — WITHOUT the
    |probes|×|names| cross product.

    Multi-pass blocking makes the candidate set complete by
    construction: a single deletion preserves the first character or
    the last character (or both), so the union of the first-char
    block and the last-char block — each also length-banded to ±1 —
    contains every true match; `levenshtein` then verifies exactly.
    This is the standard blocking+verification shape (same contract
    as LSH→exact-Jaccard in `dedup_lsh_verified`): candidates scale
    with block sizes (bounded by name-prefix frequency), never
    |A|×|B|. Distances and counts are integers; min() canonicalizes
    ties deterministically."""
    part = table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(F.expr("substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))"),
                 F.expr("substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)"))
        .alias("probe"))
    ln = lambda c: F.length(F.col(c))
    band = F.abs(ln("probe") - ln("p_name")) <= 1
    b1 = probes.join(names,
                     (F.substring("probe", 1, 1)
                      == F.substring("p_name", 1, 1)) & band)
    b2 = probes.join(names,
                     (F.expr("substr(probe, length(probe), 1)")
                      == F.expr("substr(p_name, length(p_name), 1)"))
                     & band)
    cand = b1.unionAll(b2).distinct()
    m = (cand.withColumn("dist", F.levenshtein("probe", "p_name"))
         .filter(F.col("dist") <= 1))
    return (m.groupBy("probe_id", "probe")
            .agg(F.min("p_name").alias("matched_name"),
                 F.min("dist").cast("int").alias("dist"),
                 F.count("*").alias("n_candidates")))


# ------------------------------------------------ decile gains/lift

@register(
    "orders_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    dec AS (
      SELECT cents,
             ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend),
    agg AS (
      SELECT decile, count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM dec GROUP BY decile),
    cum AS (
      SELECT decile, n_customers, cents,
             CAST(sum(cents) OVER (ORDER BY decile) AS BIGINT) AS cum,
             CAST(sum(cents) OVER () AS BIGINT) AS tot,
             CAST(sum(n_customers) OVER (ORDER BY decile) AS BIGINT)
               AS cum_n,
             CAST(sum(n_customers) OVER () AS BIGINT) AS tot_n
      FROM agg)
    SELECT decile, CAST(n_customers AS BIGINT) AS n_customers,
           round(cents / 100.0, 2) AS revenue,
           round(cum * 1.0 / tot, 6) AS cum_share,
           round(cum * 1.0 / tot * tot_n / cum_n, 6) AS lift
    FROM cum
    """,
    tags=("analytics", "window"),
)
def orders_decile_lift(spark, sf_dir):
    """Decile gains/lift table over customer spend — the model-
    evaluation staple ("the top decile captures X% of revenue, a
    Y× lift over random") applied to the customer dimension.

    Spend per customer accumulates as exact integer cents; ntile
    runs over the customer aggregate with a total-order tiebreak
    (spend DESC, custkey) so decile boundaries are deterministic;
    cumulative sums stay integer; share and lift are terminal
    divisions. The unpartitioned windows touch only the 10-row
    decile aggregate and the customer-dimension relation — never
    the order stream."""
    spend = (table(spark, sf_dir, "orders")
             .groupBy("o_custkey")
             .agg(F.sum(F.expr(
                 "CAST(round(o_totalprice * 100) AS BIGINT)"))
                 .alias("cents")))
    wd = Window.orderBy(F.desc("cents"), "o_custkey")
    dec = spend.select("cents", F.ntile(10).over(wd).alias("decile"))
    agg = (dec.groupBy("decile")
           .agg(F.count("*").alias("n_customers"),
                F.sum("cents").alias("cents")))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wa = Window.partitionBy()
    cum = agg.select(
        "decile", "n_customers", "cents",
        F.sum("cents").over(wc).alias("cum"),
        F.sum("cents").over(wa).alias("tot"),
        F.sum("n_customers").over(wc).alias("cum_n"),
        F.sum("n_customers").over(wa).alias("tot_n"))
    return cum.select(
        "decile", F.col("n_customers").cast("long"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("cum") * 1.0 / F.col("tot"), 6).alias("cum_share"),
        F.round(F.col("cum") * 1.0 / F.col("tot") * F.col("tot_n")
                / F.col("cum_n"), 6).alias("lift"))
