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
