"""Round-2 analytics wave: SCD2 dimension history, vocab-based
tokenization, and a mergeable histogram-quantile sketch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.temporal import scd2_history
from .base import register, table


@register(
    "scd2_user_history",
    oracle="""
    SELECT user_id, event_type, value,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER w) AS valid_to_us,
           lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("temporal", "scd"),
)
def scd2_user_history(spark, sf_dir):
    """SCD2 versioned history (operators/temporal.py:scd2_history):
    each user's event stream becomes [valid_from, valid_to) rows with
    an is_current flag — the history-preserving counterpart of the
    reference's SCD1 dim upsert (OdsBaseDbApp.scala:139-164). One
    key-shuffled window, epoch-us instants."""
    ev = table(spark, sf_dir, "events")
    return scd2_history(ev, "user_id", "ts", ["event_type", "value"],
                        tiebreak_cols=("event_id",))


@register(
    "tokenize_with_vocab",
    oracle="""
    WITH wc AS (
      SELECT w, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    top AS (SELECT w, n FROM wc ORDER BY n DESC, w LIMIT 100),
    vocab AS (
      SELECT w, row_number() OVER (ORDER BY n DESC, w) AS token_id
      FROM top),
    words AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
    tok AS (
      SELECT doc_id, pos, coalesce(v.token_id, 0) AS tid
      FROM words LEFT JOIN vocab v USING (w))
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos))
             AS ids_md5
    FROM tok GROUP BY doc_id
    """,
    tags=("llm", "vocab"),
)
def tokenize_with_vocab(spark, sf_dir):
    """The tokenization pass against the built vocabulary
    (vocab_build_topk's table): words → token ids (OOV → 0), per-doc
    id sequence fingerprinted with md5 so the compare stays small.
    The vocab broadcasts (it is top-V by construction); the sequence
    rebuild is sort_array over (pos, id) structs — per-doc local, no
    global order."""
    d = table(spark, sf_dir, "documents")
    wc = (d.select(F.explode(F.split("text", " ")).alias("w"))
          .groupBy("w").agg(F.count("*").alias("n")))
    top = wc.orderBy(F.col("n").desc(), "w").limit(100)
    vw = Window.orderBy(F.col("n").desc(), "w")
    vocab = top.select("w", F.row_number().over(vw).cast("long")
                       .alias("token_id"))
    words = d.select("doc_id",
                     F.posexplode(F.split("text", " ")).alias("pos", "w"))
    tok = (words.join(F.broadcast(vocab), "w", "left")
           .select("doc_id", "pos",
                   F.coalesce("token_id", F.lit(0)).alias("tid")))
    ids = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s["tid"].cast("string"))
    return (tok.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.when(F.col("tid") == 0, 1).otherwise(0))
                 .cast("long").alias("n_oov"),
                 F.md5(F.concat_ws(",", ids)).alias("ids_md5")))


N_HIST_BINS = 64


@register(
    "sketch_hist_quantiles",
    oracle=f"""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem),
    mm AS (SELECT min(v) AS lo, max(v) AS hi FROM c),
    binned AS (
      SELECT (v - lo) * {N_HIST_BINS} // (hi - lo + 1) AS b, lo, hi
      FROM c, mm),
    hist AS (
      SELECT b, lo, hi, count(*) AS n FROM binned GROUP BY b, lo, hi),
    cum AS (
      SELECT b, lo, hi, n,
             CAST(sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c_n,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM hist)
    SELECT q, CAST(min(lo + (b + 1) * (hi - lo + 1) // {N_HIST_BINS})
                   AS BIGINT) AS est_cents
    FROM cum, (SELECT unnest([50, 90, 99]) AS q)
    WHERE 100 * c_n >= q * total
    GROUP BY q
    """,
    tags=("sketch", "quantile"),
)
def sketch_hist_quantiles(spark, sf_dir):
    """Histogram quantile sketch: fixed 64-bin histogram over integer
    cents (all-integer arithmetic → engine-exact), quantile estimate =
    upper edge of the first bin whose cumulative count crosses q·N.
    The sketch state is 64 longs — mergeable by summing bins (partial
    agg does it), the scale path when exact percentile_disc would
    shuffle the full column. Two scans (min/max, then bins); both
    reductions are map-side-partial."""
    li = table(spark, sf_dir, "lineitem")
    c = li.select(F.round(F.col("l_extendedprice") * 100)
                  .cast("long").alias("v"))
    mm = c.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    span = F.col("hi") - F.col("lo") + 1
    binned = (c.crossJoin(F.broadcast(mm))
              .select(((F.col("v") - F.col("lo")) * N_HIST_BINS / span)
                      .cast("long").alias("b"), "lo", "hi"))
    hist = binned.groupBy("b", "lo", "hi").agg(F.count("*").alias("n"))
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing)
    cum = hist.select(
        "b", "lo", "hi",
        F.sum("n").over(wc).alias("c_n"),
        F.sum("n").over(wt).alias("total"))
    qs = F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q")
    est = (F.col("lo") + (F.col("b") + 1) * span / N_HIST_BINS)
    return (cum.select("*", qs)
            .filter(100 * F.col("c_n") >= F.col("q") * F.col("total"))
            .groupBy("q")
            .agg(F.min(est.cast("long")).alias("est_cents")))


@register(
    "rfm_customer_segments",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '1998-01-01') AS recency_days,
             count(*) AS frequency,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS monetary
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey),
    scored AS (
      SELECT c_custkey, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days, c_custkey) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f,
             ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m
      FROM base)
    SELECT r, f, m, count(*) AS n_customers,
           CAST(round(sum(CAST(monetary AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS segment_value
    FROM scored GROUP BY r, f, m
    """,
    tags=("analytics", "segmentation"),
)
def rfm_customer_segments(spark, sf_dir):
    """RFM segmentation: per-customer recency/frequency/monetary →
    quartile scores (ntile with deterministic custkey tie-break) →
    segment sizes. The per-customer base is one orders shuffle; the
    three ntile windows run over the CUSTOMER aggregate (dimension
    cardinality, not fact cardinality) — the global sort is of the
    small relation, same caveat class as vocabulary ranking. Date
    arithmetic is date-typed (naive wall dates, tz-free)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_custkey")
            .agg(F.datediff(F.lit("1998-01-01").cast("date"),
                            F.max(F.col("o_orderdate").cast("date")))
                 .alias("recency_days"),
                 F.count("*").alias("frequency"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
                 .cast("double").alias("monetary")))
    r = F.ntile(4).over(Window.orderBy("recency_days", "c_custkey"))
    f = F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "c_custkey"))
    m = F.ntile(4).over(Window.orderBy(F.col("monetary").desc(), "c_custkey"))
    scored = base.select("c_custkey", "monetary",
                         r.alias("r"), f.alias("f"), m.alias("m"))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum(F.col("monetary").cast("decimal(18,2)")), 2)
                 .cast("double").alias("segment_value")))


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH w AS (
      SELECT user_id,
             epoch_us(ts) // 604800000000 AS wk
      FROM events),
    cohort AS (SELECT user_id, min(wk) AS c0 FROM w GROUP BY user_id)
    SELECT c0 AS cohort_week,
           wk - c0 AS week_offset,
           count(DISTINCT w.user_id) AS active_users
    FROM w JOIN cohort ON w.user_id = cohort.user_id
    GROUP BY c0, wk - c0
    """,
    tags=("analytics", "retention"),
)
def cohort_retention_matrix(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week,
    distinct-active counts per week offset — the full generalization of
    ts_user_retention's next-day rate. Two aggregations sharing the
    user_id shuffle key + one epoch-integer week bucket (instants, no
    wall-clock)."""
    ev = table(spark, sf_dir, "events")
    wk = (F.unix_micros(F.col("ts")) / 604800000000).cast("long")
    w = ev.select("user_id", wk.alias("wk"))
    cohort = w.groupBy("user_id").agg(F.min("wk").alias("c0"))
    return (w.join(cohort, "user_id")
            .groupBy(F.col("c0").alias("cohort_week"),
                     (F.col("wk") - F.col("c0")).alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("active_users")))


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, value AS dim_value,
             epoch_us(ts) AS valid_from_us,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS valid_to_us
      FROM events WHERE event_type = 'view'),
    f AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.ts_us, d.dim_value, d.valid_from_us
    FROM f JOIN dim d ON d.user_id = f.user_id
     AND d.valid_from_us <= f.ts_us
     AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
    """,
    tags=("temporal", "scd"),
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time fact enrichment (operators/temporal.py:
    scd2_lookup): purchases join the 'view'-stream SCD2 version valid
    at purchase time — the interval-join dual of asof_join, one
    key-shuffled equi-join with interval post-filters."""
    from ..operators.temporal import scd2_history, scd2_lookup
    ev = table(spark, sf_dir, "events")
    dim = scd2_history(ev.filter(F.col("event_type") == "view"),
                       "user_id", "ts", ["value"],
                       tiebreak_cols=("event_id",))
    facts = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    return (scd2_lookup(facts, dim, "user_id", "ts", ["value"])
            .select("event_id", "user_id",
                    F.col("__ts_us").alias("ts_us"),
                    "dim_value", "valid_from_us"))


@register(
    "stat_linear_trend",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS slope_per_day,
           round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 2)
             AS intercept
    FROM events GROUP BY event_type
    """,
    tags=("analytics", "stats"),
)
def stat_linear_trend(spark, sf_dir):
    """Per-group OLS trend via the built-in regression aggregates
    (regr_slope/regr_intercept — single-pass moment sums in codegen,
    one keyed shuffle; x in day units so the slope magnitude survives
    the 4dp rounding both engines apply)."""
    ev = table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(86400000000.0)
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.regr_slope(F.col("value"), x), 4)
                 .alias("slope_per_day"),
                 F.round(F.regr_intercept(F.col("value"), x), 2)
                 .alias("intercept")))


@register(
    "stat_corr_matrix",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
           round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    """,
    tags=("analytics", "stats"),
)
def stat_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem measures in ONE
    scan — all three corr aggregates share the pass (moment sums in
    whole-stage codegen; the feature-covariance step of a training
    pipeline's profiling stage)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4)
        .alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("corr_qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4)
        .alias("corr_price_disc"),
        F.count("*").alias("n"))


@register(
    "stat_ttest_welch",
    oracle="""
    WITH s AS (
      SELECT count(*) FILTER (WHERE event_type = 'purchase') AS n1,
             avg(value) FILTER (WHERE event_type = 'purchase') AS m1,
             var_samp(value) FILTER (WHERE event_type = 'purchase') AS v1,
             count(*) FILTER (WHERE event_type = 'view') AS n2,
             avg(value) FILTER (WHERE event_type = 'view') AS m2,
             var_samp(value) FILTER (WHERE event_type = 'view') AS v2
      FROM events)
    SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
           round(m1 - m2, 4) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 1) AS df_welch
    FROM s
    """,
    tags=("analytics", "stats"),
)
def stat_ttest_welch(spark, sf_dir):
    """Welch two-sample t on event value between purchase and view
    cohorts — the A/B-experiment readout, in ONE scan: conditional
    aggregates (count/avg/var_samp under when()) share the pass in
    codegen, the t statistic and Welch–Satterthwaite df are scalar
    arithmetic on the single result row. No join, no second scan."""
    ev = table(spark, sf_dir, "events")

    def side(t):
        c = F.when(F.col("event_type") == t, F.col("value"))
        return (F.count(c), F.avg(c), F.var_samp(c))

    n1, m1, v1 = side("purchase")
    n2, m2, v2 = side("view")
    se2 = v1 / n1 + v2 / n2
    return ev.agg(
        n1.alias("n_purchase"), n2.alias("n_view"),
        F.round(m1 - m2, 4).alias("mean_diff"),
        F.round((m1 - m2) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(F.pow(se2, 2)
                / (F.pow(v1 / n1, 2) / (n1 - 1)
                   + F.pow(v2 / n2, 2) / (n2 - 1)), 1).alias("df_welch"))


@register(
    "stat_chi_square",
    oracle="""
    WITH obs AS (SELECT lang, source, count(*) AS o
                 FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
    c AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
    t AS (SELECT sum(o) AS n FROM obs),
    cell AS (
      SELECT r.lang, c.source, coalesce(obs.o, 0) AS o,
             r.rt * c.ct * 1.0 / t.n AS e
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source)
    SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
           CAST((SELECT count(*) - 1 FROM r)
                * (SELECT count(*) - 1 FROM c) AS BIGINT) AS dof,
           CAST((SELECT n FROM t) AS BIGINT) AS n
    FROM cell
    """,
    tags=("analytics", "stats"),
)
def stat_chi_square(spark, sf_dir):
    """Chi-square independence of lang x source on the corpus — the
    contingency check a curation pipeline runs to spot source/language
    coupling. One scan builds the observed cells; margins are tiny
    re-aggregations of the CELL relation (not the corpus), and the
    full margin cross (langs x sources, includes zero cells) joins
    broadcast — all post-scan work is on dimension-cardinality data.
    One job end-to-end: dof comes from countDistinct inside the final
    aggregate, not separate margin count() actions."""
    d = table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    r = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    c = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    t = obs.agg(F.sum("o").alias("n"))
    cell = (r.crossJoin(F.broadcast(c)).crossJoin(F.broadcast(t))
            .join(F.broadcast(obs), ["lang", "source"], "left")
            .select("lang", "source",
                    F.coalesce(F.col("o"), F.lit(0)).alias("o"),
                    (F.col("rt") * F.col("ct") / F.col("n")).alias("e")))
    out = cell.agg(
        F.round(F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 4)
        .alias("chi2"),
        ((F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1))
        .cast("long").alias("dof"),
        F.sum("o").cast("long").alias("n"))
    return out
