"""Round-3 analytics wave: behavioral path analysis, time-series
anomaly detection, canonicalizing dedup, and embedding-norm profiling.

All four are one-scan, key-shuffled plans (no self-joins, no driver
materialization) — the shapes that survive a 1000-executor scale-up.
Oracle discipline follows queries/base.py: identical column aliases,
epoch-integer event times, derived floats rounded identically on both
sides before any cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

US_PER_DAY = 86_400_000_000


@register(
    "event_path_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, count(*) AS n,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("analytics", "window"),
)
def event_path_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event paths:
    for each (event_type → next_type) edge, the count and the
    row-normalized transition probability. One user_id-keyed window
    orders each user's history (ties broken by event_id for
    determinism), then a single (from, to)-keyed aggregation — at scale
    both stages shuffle on small keys and the window state per user is
    one row of lookahead. The probability normalizer is a second
    window over the tiny aggregated matrix (|event_types|² rows), not
    the events table."""
    ev = table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    by_from = Window.partitionBy("event_type")
    return (ev.withColumn("next_type", F.lead("event_type").over(seq))
            .filter(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
            .withColumn("p", F.round(F.col("n") / F.sum("n").over(by_from), 6)))


@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, day, n,
             round(CASE WHEN stddev_samp(n) OVER w = 0 THEN NULL
                        ELSE (n - avg(n) OVER w) / stddev_samp(n) OVER w
                   END, 4) AS z
      FROM daily WINDOW w AS (PARTITION BY event_type))
    SELECT event_type, day, n, z,
           coalesce(abs(z) >= 2.0, false) AS is_anomaly
    FROM scored
    """,
    tags=("analytics", "timeseries"),
)
def ts_anomaly_zscore(spark, sf_dir):
    """Daily-count anomaly detection: per event_type, each epoch-day's
    event count is z-scored against that type's own distribution and
    flagged at |z| ≥ 2. The events scan collapses to |types|×|days|
    rows in one partial-aggregated groupBy; the z-score window runs on
    that tiny aggregate. The flag is computed on the ROUNDED z so both
    engines make the same boundary call. Day buckets are epoch-integer
    (timezone discipline, queries/base.py)."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.floor(F.unix_micros("ts") / US_PER_DAY)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type")
    std = F.stddev_samp("n").over(w)
    z = F.round(F.when(std == 0, F.lit(None))
                .otherwise((F.col("n") - F.avg("n").over(w)) / std), 4)
    return (daily.withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("z")) >= 2.0, F.lit(False))))


@register(
    "events_dau_wau",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events),
    dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
    contrib AS (
      SELECT user_id, day + o.off AS day
      FROM pairs, (SELECT unnest(range(0, 7)) AS off) o),
    wau AS (
      SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY day)
    SELECT d.day, d.dau, w.wau,
           round(d.dau * 1.0 / w.wau, 4) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
    tags=("analytics", "timeseries"),
)
def events_dau_wau(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day. Trailing distinct
    counts can't run as a window function (no count-distinct-over-
    range), so each (user, day) pair CONTRIBUTES to the 7 window-days
    it belongs to — a 7× explode of the already-collapsed distinct
    pairs (|users|×|days| rows, tiny next to the event stream), then
    plain partial-aggregated counts. Day buckets are epoch-integer.
    At scale: one distinct shuffle of small pairs, everything after is
    map-side combinable — no events self-join, no per-day rescans."""
    ev = table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / US_PER_DAY).cast("long")
    pairs = ev.select("user_id", day.alias("day")).distinct()
    dau = pairs.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = pairs.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"))
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), 4)
                    .alias("stickiness")))


@register(
    "dedup_normalized_exact",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
      FROM documents)
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY h) AS canonical_id,
           doc_id <> min(doc_id) OVER (PARTITION BY h) AS is_dup
    FROM canon
    """,
    tags=("llm", "dedup"),
)
def dedup_normalized_exact(spark, sf_dir):
    """Canonicalize-then-hash dedup: the curation-pipeline form of
    exact dedup where near-identical texts differing only in case,
    punctuation, or whitespace collapse to one canonical doc. Text →
    lowercase → strip non-alphanumerics → collapse runs of spaces →
    md5; the group representative is the min doc_id via one hash-keyed
    window. Shuffles 32-byte digests, not document bodies — the same
    scale posture as dedup_exact (llm/dedup.py) with the normalizer
    fused into the scan projection (whole-stage codegen, no UDF)."""
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "))
    h = Window.partitionBy(F.md5(norm))
    canonical = F.min("doc_id").over(h)
    return docs.select(
        "doc_id", canonical.alias("canonical_id"),
        (F.col("doc_id") != canonical).alias("is_dup"))


@register(
    "embedding_norm_stats",
    oracle="""
    WITH norms AS (
      SELECT label,
             round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                x -> x * x))), 6) AS nrm
      FROM embeddings)
    SELECT label, count(*) AS n,
           round(avg(nrm), 4) AS avg_norm,
           round(stddev_samp(nrm), 4) AS std_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
    FROM norms GROUP BY label
    """,
    tags=("llm", "embedding"),
)
def embedding_norm_stats(spark, sf_dir):
    """Per-label L2-norm profile of the embedding corpus — the
    drift/QA check a training pipeline runs before similarity search
    (un-normalized or degenerate vectors poison cosine math). The norm
    is a fused array fold inside the scan projection (F.aggregate —
    JVM higher-order function, no Python boundary); the per-label
    reduction is one partially-aggregated groupBy on a tiny key. Norms
    are rounded to 6dp before aggregation so both engines fold the
    same inputs; aggregates rounded to 4dp absorb summation-order
    last-bit drift."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    nrm = F.round(F.sqrt(F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)), 6)
    return (emb.select("label", nrm.alias("nrm"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("nrm"), 4).alias("avg_norm"),
                 F.round(F.stddev_samp("nrm"), 4).alias("std_norm"),
                 F.round(F.min("nrm"), 4).alias("min_norm"),
                 F.round(F.max("nrm"), 4).alias("max_norm")))


@register(
    "stat_ab_proportion_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    g AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM u GROUP BY variant),
    w AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 0 THEN conv END) AS c0,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM g),
    s AS (
      SELECT n0, c0, n1, c1,
             c0 * 1.0 / n0 AS p0, c1 * 1.0 / n1 AS p1,
             sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                  * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                  * (1.0 / n0 + 1.0 / n1)) AS se
      FROM w)
    SELECT n0, c0, n1, c1,
           round(p0, 6) AS p0, round(p1, 6) AS p1,
           round(CASE WHEN se = 0 THEN NULL ELSE (p0 - p1) / se END, 4) AS z
    FROM s
    """,
    tags=("analytics", "stat"),
)
def stat_ab_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test for A/B conversion rates: users split
    deterministically by user_id parity, 'converted' = had ≥1 purchase
    event; z from the pooled-proportion standard error — the
    experiment-readout companion to stat_ttest_welch (means) and
    stat_chi_square (independence). Events collapse to per-user flags
    in one groupBy, then to two variant rows, then to one output row —
    every stage partially aggregates map-side; nothing scales with the
    event count after the first groupBy."""
    ev = table(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("converted"))
         .withColumn("variant", F.col("user_id") % 2))
    g = (u.groupBy("variant")
         .agg(F.count("*").alias("n"), F.sum("converted").alias("conv")))
    w = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"))
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n0") + 1 / F.col("n1")))
    # se == 0 (all or none converted) → z undefined, NULL on both sides
    z = F.when(se == 0, F.lit(None)).otherwise((p0 - p1) / se)
    return w.select(
        "n0", "c0", "n1", "c1",
        F.round(p0, 6).alias("p0"), F.round(p1, 6).alias("p1"),
        F.round(z, 4).alias("z"))


@register(
    "session_paths_top",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events),
    s AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s2 AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
    p AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path
      FROM s2 GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
    tags=("analytics", "window"),
)
def session_paths_top(spark, sf_dir):
    """Top-10 session paths: sessionize each user's stream with a
    30-minute inactivity gap (gaps-and-islands — lag + cumulative sum,
    one user-keyed window pair), concatenate each session's ordered
    event types into a path string, and count path frequencies. The
    path build sorts WITHIN each session's collected array (struct
    sort, no second shuffle); the top-10 is TakeOrderedAndProject
    ((n DESC, path) — deterministic), never a global sort. The session
    census a product team mines for dominant behavior flows."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sid = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sessions = ev.select("user_id", "event_id", "event_type",
                         us.alias("us"), sid.alias("sid"))
    paths = (sessions
             .groupBy("user_id", "sid")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("us", "event_id", "event_type"))),
                     lambda s: s["event_type"]), ">").alias("path")))
    return (paths.groupBy("path").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "path").limit(10))


@register(
    "funnel_3step_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.us) AS t2
           FROM e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.us >= s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.us) AS t3
           FROM e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.us >= s2.t2
           GROUP BY e.user_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
           round((SELECT count(*) FROM s2) * 1.0
                 / (SELECT count(*) FROM s1), 6) AS rate_view_click,
           round((SELECT count(*) FROM s3) * 1.0
                 / (SELECT count(*) FROM s2), 6) AS rate_click_purchase,
           round((SELECT count(*) FROM s3) * 1.0
                 / (SELECT count(*) FROM s1), 6) AS rate_overall
    """,
    tags=("analytics", "funnel"),
)
def funnel_3step_conversion(spark, sf_dir):
    """Ordered 3-step funnel (view → click → purchase): each step's
    cohort is users whose step event occurs AT OR AFTER their previous
    step's first occurrence — the strict-ordering semantics marketing
    funnels need (a purchase before the first view does not convert).
    Three user-keyed min-aggregations chained by join; each stage's
    relation shrinks (funnel cohorts only), every aggregation partial.
    Extends the 2-step ts_funnel_view_purchase (and its stateful
    streaming twin) to the multi-step shape."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    s1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("us").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id").filter(F.col("us") >= F.col("t1"))
          .groupBy("user_id").agg(F.min("us").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id").filter(F.col("us") >= F.col("t2"))
          .groupBy("user_id").agg(F.min("us").alias("t3")))
    n1 = s1.agg(F.count("*").alias("n_view"))
    n2 = s2.agg(F.count("*").alias("n_click"))
    n3 = s3.agg(F.count("*").alias("n_purchase"))
    return (n1.crossJoin(n2).crossJoin(n3)
            .select("n_view", "n_click", "n_purchase",
                    F.round(F.col("n_click") / F.col("n_view"), 6)
                    .alias("rate_view_click"),
                    F.round(F.col("n_purchase") / F.col("n_click"), 6)
                    .alias("rate_click_purchase"),
                    F.round(F.col("n_purchase") / F.col("n_view"), 6)
                    .alias("rate_overall")))


@register(
    "events_hourly_seasonality",
    oracle="""
    WITH h AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) % 24 AS hour_utc,
             count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_utc, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6)
             AS share
    FROM h
    """,
    tags=("analytics", "timeseries"),
)
def events_hourly_seasonality(spark, sf_dir):
    """Hour-of-day seasonality profile per event type (UTC hours,
    epoch-integer arithmetic — timezone-proof): counts and the
    within-type share. The events scan collapses to ≤ |types|×24 rows
    map-side; the share window runs over that aggregate only. The
    load-shaping input for capacity planning and anomaly baselines."""
    ev = table(spark, sf_dir, "events")
    hour = (F.floor(F.unix_micros("ts") / 3_600_000_000) % 24).cast("long")
    h = (ev.groupBy("event_type", hour.alias("hour_utc"))
         .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type")
    return h.withColumn(
        "share", F.round(F.col("n") / F.sum("n").over(w), 6))


@register(
    "interval_join_session_overlap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    s AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s2 AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
    iv AS (
      SELECT user_id, sid, min(us) AS s_us, max(us) + 1 AS e_us
      FROM s2 GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND a.s_us < b.e_us AND b.s_us < a.e_us
    """,
    tags=("analytics", "join", "temporal"),
)
def interval_join_session_overlap(spark, sf_dir):
    """Interval-overlap join (operators/temporal.py:
    interval_overlap_join): count cross-user pairs of concurrent
    sessions — the concurrency analysis behind capacity planning and
    co-occurrence features. Sessions come from the same 30-minute
    gaps-and-islands pass as session_paths_top; intervals explode into
    1-hour buckets so the overlap inequality runs as a bucket
    equi-join + residual, never the |S|² nested loop DuckDB's IEJoin
    solves natively."""
    from ..operators.temporal import interval_overlap_join
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sid = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    iv = (ev.select("user_id", "event_id", us.alias("us"), sid.alias("sid"))
          .groupBy("user_id", "sid")
          .agg(F.min("us").alias("s_us"),
               (F.max("us") + 1).alias("e_us")))
    a = iv.select(F.col("user_id").alias("user_a"),
                  F.col("s_us").alias("sa"), F.col("e_us").alias("ea"))
    b = iv.select(F.col("user_id").alias("user_b"),
                  F.col("s_us").alias("sb"), F.col("e_us").alias("eb"))
    pairs = interval_overlap_join(
        a, b, "sa", "ea", "sb", "eb", bucket_us=3_600_000_000,
        condition=F.col("user_a") < F.col("user_b"))
    return pairs.agg(F.count("*").alias("n_pairs"))


def _pagerank_oracle(n_iter: int = 10, damping: float = 0.85) -> str:
    """Unrolled-CTE PageRank (same technique as the k-means oracle):
    one contrib+rank CTE pair per iteration, 6dp rounding per round —
    textually generated from the SAME constants as the Spark loop."""
    d = damping
    parts = [f"""
    edges AS (
      SELECT DISTINCT s.event_type AS src, s.next_type AS dst FROM (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events) s
      WHERE s.next_type IS NOT NULL),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 6) AS rank
           FROM nodes)"""]
    for k in range(1, n_iter + 1):
        parts.append(f"""
    c{k} AS (
      SELECT e.dst AS node, sum(r.rank / od.deg) AS s
      FROM edges e
      JOIN r{k - 1} r ON r.node = e.src
      JOIN outdeg od ON od.node = e.src
      GROUP BY e.dst),
    r{k} AS (
      SELECT n.node,
             round((1 - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(c.s, 0), 6) AS rank
      FROM nodes n LEFT JOIN c{k} c USING (node))""")
    return ("WITH" + ",".join(parts)
            + f"\n    SELECT node, rank FROM r{n_iter}")


@register(
    "graph_pagerank_transitions",
    oracle=_pagerank_oracle(),
    tags=("analytics", "graph"),
)
def graph_pagerank_transitions(spark, sf_dir):
    """PageRank over the event-type transition graph (operators/
    graph.py:pagerank — 10 damped iterations, 6dp-rounded per round so
    both engines iterate on identical values). The graph here is tiny
    (|event_types|² edges after the same transition window as
    event_path_transitions), but the operator is the generic
    edge-list iteration — per-round keyed join + sum, lineage-cut —
    that runs unchanged on a billion-edge graph; the oracle replays
    all 10 rounds as unrolled CTEs."""
    from ..operators.graph import pagerank
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (ev.withColumn("dst", F.lead("event_type").over(w))
             .filter(F.col("dst").isNotNull())
             .select(F.col("event_type").alias("src"), "dst")
             .distinct())
    return pagerank(edges, "src", "dst", n_iter=10, damping=0.85)


@register(
    "orders_ship_latency",
    oracle="""
    WITH first_ship AS (
      SELECT l_orderkey, min(l_shipdate) AS ship0
      FROM lineitem GROUP BY l_orderkey)
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(date_diff('day', o.o_orderdate, f.ship0)), 4)
             AS avg_days,
           round(median(date_diff('day', o.o_orderdate, f.ship0)), 4)
             AS median_days,
           CAST(max(date_diff('day', o.o_orderdate, f.ship0)) AS BIGINT)
             AS max_days
    FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("analytics", "join"),
)
def orders_ship_latency(spark, sf_dir):
    """Fulfillment latency per order priority: days from order date to
    the order's FIRST shipment (min over its line items), with exact
    median. Lineitem collapses to one row per order before the join
    (partial-agg then a keyed join of equal-grain relations); the
    date_diff is wall-clock date arithmetic — timezone-free on both
    engines. The operations-dashboard query every order system runs."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    first_ship = (li.groupBy("l_orderkey")
                  .agg(F.min("l_shipdate").alias("ship0")))
    days = F.datediff(F.col("ship0").cast("date"),
                      F.col("o_orderdate").cast("date"))
    return (o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
            .select("o_orderpriority", days.alias("d"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("d"), 4).alias("avg_days"),
                 F.round(F.median("d"), 4).alias("median_days"),
                 F.max("d").cast("long").alias("max_days")))


@register(
    "ts_moving_avg_pct_change",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      FROM events GROUP BY 1)
    SELECT day, n,
           round(avg(n) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS ma7,
           round((n - lag(n) OVER (ORDER BY day)) * 100.0
                 / lag(n) OVER (ORDER BY day), 4) AS pct_change
    FROM daily
    """,
    tags=("analytics", "timeseries"),
)
def ts_moving_avg_pct_change(spark, sf_dir):
    """Trailing 7-day moving average and day-over-day percent change
    of daily event volume — the smoothing/trend pair on every ops
    dashboard. The raw stream collapses to one row per day BEFORE the
    ordered window, so the unpartitioned ORDER BY day touches |days|
    rows, not events (an unpartitioned window over raw events would be
    the single-task trap at scale; over the daily aggregate it is
    negligible by construction)."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.floor(F.unix_micros("ts") / US_PER_DAY)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("n")))
    w = Window.orderBy("day")
    ma = F.round(F.avg("n").over(w.rowsBetween(-6, 0)), 4)
    prev = F.lag("n").over(w)
    return (daily
            .withColumn("ma7", ma)
            .withColumn("pct_change",
                        F.round((F.col("n") - prev) * 100.0 / prev, 4)))


@register(
    "pareto_top_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_partkey),
    tot AS (
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS total
      FROM lineitem),
    ranked AS (
      SELECT l_partkey, revenue,
             round(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                      ROWS UNBOUNDED PRECEDING)
                   / (SELECT total FROM tot), 6) AS cum_share,
             row_number() OVER (ORDER BY revenue DESC, l_partkey) AS rnk,
             round(revenue / (SELECT total FROM tot), 6) AS share
      FROM rev)
    SELECT l_partkey, revenue, cum_share, CAST(rnk AS BIGINT) AS rnk
    FROM ranked
    WHERE round(cum_share - share, 6) < 0.8
    """,
    tags=("analytics", "window"),
)
def pareto_top_parts(spark, sf_dir):
    """Pareto (80/20) analysis: the smallest set of parts covering 80%
    of revenue — keep every part whose cumulative share BEFORE it is
    under 0.8, so the set crosses the threshold inclusively and ties
    break on part key in both engines. Money goes through DECIMAL
    (queries/relational.py discipline): per-part revenue and the
    corpus total are exact decimal sums rounded to 2dp, so every
    later double is identical on both engines; the running cumulative
    then adds those 2dp doubles in the SAME rank order on both sides
    (deterministic frame order ⇒ bit-identical partial sums). One
    lineitem partial-agg; the window runs over |parts| rows."""
    from .relational import _dec, money_sum
    li = table(spark, sf_dir, "lineitem")
    money = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    rev = li.groupBy("l_partkey").agg(money_sum(money).alias("revenue"))
    tot = li.agg(money_sum(money).alias("total"))
    w = Window.orderBy(F.desc("revenue"), "l_partkey")
    cum = F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ranked = (rev.crossJoin(F.broadcast(tot))
              .select("l_partkey", "revenue",
                      F.round(cum / F.col("total"), 6).alias("cum_share"),
                      F.row_number().over(w).cast("long").alias("rnk"),
                      F.round(F.col("revenue") / F.col("total"), 6)
                      .alias("_share")))
    return (ranked
            .filter(F.round(F.col("cum_share") - F.col("_share"), 6) < 0.8)
            .drop("_share"))


@register(
    "customer_order_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate,
                                                       o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders)
    SELECT o_custkey,
           CAST(count(gap_days) AS BIGINT) AS n_gaps,
           round(avg(gap_days), 4) AS avg_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    tags=("analytics", "window"),
)
def customer_order_gap_stats(spark, sf_dir):
    """Inter-order gap statistics per customer (days between
    consecutive orders via one customer-keyed lag window) — the
    repurchase-cadence input to churn models. Deterministic under
    same-day orders via the o_orderkey tiebreak; single shuffle on
    customer, everything after partial-aggregates."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(F.col("o_orderdate").cast("date"),
                     F.lag(F.col("o_orderdate").cast("date")).over(w))
    return (o.select("o_custkey", gap.alias("gap_days"))
            .filter(F.col("gap_days").isNotNull())
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
                 F.min("gap_days").cast("long").alias("min_gap_days"),
                 F.max("gap_days").cast("long").alias("max_gap_days")))


@register(
    "supplier_part_hhi",
    oracle="""
    WITH q AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2)
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(qty * qty) * 1.0 / (sum(qty) * sum(qty)), 6) AS hhi
    FROM q GROUP BY l_partkey
    """,
    tags=("analytics", "agg"),
)
def supplier_part_hhi(spark, sf_dir):
    """Supply-concentration index per part: Herfindahl-Hirschman =
    Σ share², share = supplier's quantity fraction of the part (1.0 =
    single-sourced, →1/n = evenly spread) — the sourcing-risk screen.
    Lineitem collapses to (part, supplier) partials map-side, then
    one part-keyed aggregation computes HHI in the algebraic form
    Σq² / (Σq)² — per-supplier quantities are integer-valued, so both
    sums are EXACT BIGINTs and the single final division is
    bit-identical on both engines (the naive Σ(q/total)² sums floats
    in engine-dependent order and flips 6dp roundings)."""
    li = table(spark, sf_dir, "lineitem")
    q = (li.groupBy("l_partkey", "l_suppkey")
         .agg(F.sum("l_quantity").cast("long").alias("qty")))
    return (q.groupBy("l_partkey")
            .agg(F.count("*").alias("n_suppliers"),
                 F.round(F.sum(F.col("qty") * F.col("qty"))
                         / (F.sum("qty") * F.sum("qty")), 6).alias("hhi")))


@register(
    "events_value_outliers_iqr",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type),
    f AS (
      SELECT e.event_type, e.value,
             round(b.q1 - 1.5 * (b.q3 - b.q1), 4) AS lo,
             round(b.q3 + 1.5 * (b.q3 - b.q1), 4) AS hi
      FROM events e JOIN b USING (event_type))
    SELECT event_type, lo, hi,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value < lo OR value > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM f GROUP BY event_type, lo, hi
    """,
    tags=("analytics", "stat"),
)
def events_value_outliers_iqr(spark, sf_dir):
    """Tukey-fence outlier screen per event type: exact linear-
    interpolated quartiles (Spark `percentile` == DuckDB
    `quantile_cont`) set [q1−1.5·IQR, q3+1.5·IQR]; a second pass
    counts values outside the 4dp-rounded fences (rounding before the
    comparison so both engines make identical boundary calls). The
    quartile aggregate collapses per type; the fence table broadcasts
    back onto the scan — two passes, no sort of the full table."""
    ev = table(spark, sf_dir, "events")
    b = (ev.groupBy("event_type")
         .agg(F.percentile("value", 0.25).alias("q1"),
              F.percentile("value", 0.75).alias("q3")))
    fences = b.select(
        "event_type",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 4)
        .alias("lo"),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 4)
        .alias("hi"))
    out = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (ev.join(F.broadcast(fences), "event_type")
            .groupBy("event_type", "lo", "hi")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers")))


@register(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6)
             AS type_entropy
    FROM c GROUP BY user_id
    """,
    tags=("analytics", "stat"),
)
def events_user_entropy(spark, sf_dir):
    """Behavioral diversity per user: Shannon entropy of the user's
    event-type distribution (0 = single-type bot-like, log2(5) = fully
    mixed) — the engagement-diversity feature for churn/bot models.
    Same algebraic one-pass form as llm/curation.py:char_entropy
    (H = log2(N) − Σ n·log2(n)/N): counts collapse map-side to
    ≤ |types| rows per user, and the 6dp rounding absorbs libm log2
    last-bit differences."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = F.sum("n")
    return (c.groupBy("user_id")
            .agg(tot.cast("long").alias("n_events"),
                 F.count("*").alias("n_types"),
                 F.round(F.log2(tot)
                         - F.sum(F.col("n") * F.log2("n")) / tot, 6)
                 .alias("type_entropy")))


@register(
    "window_funnel_levels",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
    l2 AS (
      SELECT v.user_id, v.us,
             min(c.us) AS t2
      FROM v JOIN e c
        ON c.user_id = v.user_id AND c.event_type = 'click'
       AND c.us >= v.us AND c.us < v.us + 86400000000
      GROUP BY v.user_id, v.us),
    l3 AS (
      SELECT l2.user_id, l2.us,
             min(p.us) AS t3
      FROM l2 JOIN e p
        ON p.user_id = l2.user_id AND p.event_type = 'purchase'
       AND p.us >= l2.t2 AND p.us < l2.us + 86400000000
      GROUP BY l2.user_id, l2.us),
    lv AS (
      SELECT v.user_id,
             CASE WHEN l3.us IS NOT NULL THEN 3
                  WHEN l2.us IS NOT NULL THEN 2
                  ELSE 1 END AS lvl
      FROM v
      LEFT JOIN l2 ON l2.user_id = v.user_id AND l2.us = v.us
      LEFT JOIN l3 ON l3.user_id = v.user_id AND l3.us = v.us)
    SELECT user_id, CAST(max(lvl) AS BIGINT) AS funnel_level
    FROM lv GROUP BY user_id
    """,
    tags=("analytics", "funnel", "window"),
)
def window_funnel_levels(spark, sf_dir):
    """windowFunnel (the ClickHouse-named analytic): per user, the
    deepest view→click→purchase chain where every step lands within
    24 h of the CHAIN'S OWN starting view — stricter than the global
    funnel_3step_conversion (each view anchors its own window, so a
    stale view doesn't borrow a later conversion). Levels resolve via
    keyed join + min-aggregation per step, every stage user-keyed; the
    final per-user max collapses the candidate chains. At scale each
    step relation shrinks to chain survivors, and no stage ever sorts
    the raw stream globally."""
    W = 86_400_000_000
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    v = ev.filter(F.col("event_type") == "view").select("user_id", "us")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("us").alias("cus")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("us").alias("pus")))
    l2 = (v.join(clicks, "user_id")
          .filter((F.col("cus") >= F.col("us"))
                  & (F.col("cus") < F.col("us") + W))
          .groupBy("user_id", "us").agg(F.min("cus").alias("t2")))
    l3 = (l2.join(purchases, "user_id")
          .filter((F.col("pus") >= F.col("t2"))
                  & (F.col("pus") < F.col("us") + W))
          .groupBy("user_id", "us").agg(F.min("pus").alias("t3")))
    lv = (v.join(l2.select("user_id", "us", F.lit(2).alias("_l2")),
                 ["user_id", "us"], "left")
          .join(l3.select("user_id", "us", F.lit(3).alias("_l3")),
                ["user_id", "us"], "left")
          .select("user_id",
                  F.coalesce("_l3", "_l2", F.lit(1)).alias("lvl")))
    return (lv.groupBy("user_id")
            .agg(F.max("lvl").cast("long").alias("funnel_level")))


@register(
    "nation_trade_balance",
    oracle="""
    WITH exports AS (
      SELECT n.n_name AS nation,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS export_rev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name),
    imports AS (
      SELECT n.n_name AS nation,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS import_rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name)
    SELECT coalesce(e.nation, i.nation) AS nation,
           coalesce(e.export_rev, 0) AS export_rev,
           coalesce(i.import_rev, 0) AS import_rev,
           round(coalesce(e.export_rev, 0) - coalesce(i.import_rev, 0), 2)
             AS balance
    FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
    """,
    tags=("analytics", "join"),
)
def nation_trade_balance(spark, sf_dir):
    """Trade balance per nation: revenue supplied (export side, via
    supplier nation) minus revenue consumed (import side, via customer
    nation) — the q7 volume-shipping shape folded to a per-nation net.
    Each side is one lineitem aggregation with broadcast dim joins
    (supplier/customer/nation are dims; facts never shuffle for
    enrichment); the two |nations|-row aggregates meet in a full outer
    join. Money through exact DECIMAL sums (relational.py discipline)."""
    from .relational import _dec, money_sum
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    money = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    exports = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
               .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .groupBy(F.col("n_name").alias("nation"))
               .agg(money_sum(money).alias("export_rev")))
    imports = (li.join(o, li.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .groupBy(F.col("n_name").alias("nation"))
               .agg(money_sum(money).alias("import_rev")))
    return (exports.join(imports, "nation", "full_outer")
            .select("nation",
                    F.coalesce("export_rev", F.lit(0.0)).alias("export_rev"),
                    F.coalesce("import_rev", F.lit(0.0)).alias("import_rev"),
                    F.round(F.coalesce("export_rev", F.lit(0.0))
                            - F.coalesce("import_rev", F.lit(0.0)), 2)
                    .alias("balance")))


@register(
    "text_zipf_slope",
    oracle="""
    WITH wc AS (
      SELECT w, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rnk
      FROM wc)
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(regr_slope(log2(n), log2(rnk)), 4) AS zipf_slope,
           round(regr_r2(log2(n), log2(rnk)), 4) AS r2
    FROM ranked
    """,
    tags=("llm", "text", "stat"),
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law fit for the corpus: OLS slope of log2(frequency) on
    log2(rank) over the word frequency table (natural corpora slope
    ≈ −1; heavy repetition or templated text bends it) — a one-number
    corpus-health check next to the entropy and repetition signals.
    Word counts partial-aggregate map-side; the rank window runs over
    the |vocab| rows only; the regression is a single-pass moment
    aggregate (regr_slope/regr_r2) in codegen on both engines."""
    docs = table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(F.split("text", " ")).alias("w"))
          .groupBy("w").agg(F.count("*").alias("n")))
    rnk = F.row_number().over(Window.orderBy(F.desc("n"), "w"))
    ranked = wc.select("n", rnk.alias("rnk"))
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(F.regr_slope(F.log2("n"), F.log2("rnk")), 4)
        .alias("zipf_slope"),
        F.round(F.regr_r2(F.log2("n"), F.log2("rnk")), 4).alias("r2"))


@register(
    "events_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(n), 4) AS mean_daily,
           round(CASE WHEN avg(n) = 0 THEN NULL
                      ELSE var_samp(n) / avg(n) END, 4) AS fano
    FROM daily GROUP BY event_type
    """,
    tags=("analytics", "stat", "timeseries"),
)
def events_burstiness_fano(spark, sf_dir):
    """Burstiness per event type: the Fano factor (variance/mean of
    daily counts — 1 ≈ Poisson arrivals, ≫1 = bursty/campaign-driven,
    ≪1 = throttled/regular) — the dispersion diagnostic that tells an
    alerting system which baselines a plain z-score can trust. Daily
    counts collapse map-side; the moments are one tiny per-type
    aggregate."""
    ev = table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.floor(F.unix_micros("ts") / US_PER_DAY)
                        .cast("long").alias("day"))
             .agg(F.count("*").alias("n")))
    mean = F.avg("n")
    fano = F.when(mean == 0, F.lit(None)).otherwise(F.var_samp("n") / mean)
    return (daily.groupBy("event_type")
            .agg(F.count("*").alias("n_days"),
                 F.round(mean, 4).alias("mean_daily"),
                 F.round(fano, 4).alias("fano")))


@register(
    "brand_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS revenue,
             CAST(count(DISTINCT p.p_partkey) AS BIGINT) AS n_parts
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand),
    tot AS (
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                  AS DOUBLE) AS total
      FROM lineitem)
    SELECT p_brand, revenue, n_parts,
           round(revenue / (SELECT total FROM tot), 6) AS share
    FROM rev
    """,
    tags=("analytics", "join", "agg"),
)
def brand_revenue_share(spark, sf_dir):
    """Revenue share per brand: broadcast part-dim join, exact DECIMAL
    money sums per brand and for the corpus total, one deterministic
    double division at the end — the market-share readout with the
    same float discipline as pareto_top_parts (no order-dependent
    float accumulation anywhere)."""
    from .relational import _dec, money_sum
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    money = _dec("l_extendedprice") * (1 - _dec("l_discount", "4,2"))
    rev = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .groupBy("p_brand")
           .agg(money_sum(money).alias("revenue"),
                F.countDistinct("p_partkey").alias("n_parts")))
    tot = li.agg(money_sum(money).alias("total"))
    return (rev.crossJoin(F.broadcast(tot))
            .select("p_brand", "revenue", "n_parts",
                    F.round(F.col("revenue") / F.col("total"), 6)
                    .alias("share")))
