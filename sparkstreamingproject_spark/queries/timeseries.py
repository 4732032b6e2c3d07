"""Event-time queries — batch-equivalent semantics of the streaming ops
(SURVEY.md §2.F gaps: watermark, tumbling/sliding/session windows,
dedup; §5.1 strategy: every streaming op is designed batch-first so the
DuckDB oracle can verify it, then the same expression runs under
``readStream`` — see ``streaming/windows.py`` and tests/test_streaming.py).

Time discipline (see queries/base.py): ``events.ts`` is a true UTC
instant; every output here is an epoch *integer* (seconds or micros),
computed with ``unix_micros`` arithmetic on the Spark side and
``epoch()``/``epoch_us()`` on the DuckDB side — machine-timezone-proof
by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

US_PER_S = 1_000_000


def _bucket_epoch(col, width_s: int):
    """Epoch-aligned bucket start, in whole seconds (BIGINT)."""
    width_us = width_s * US_PER_S
    return (F.unix_micros(col) - F.unix_micros(col) % width_us) / US_PER_S


@register(
    "ts_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS ws_epoch,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("time", "streaming-equivalent"),
)
def ts_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregation — the batch semantics of
    ``groupBy(window(ts, '1 hour'))``; at 100 TB this is a plain hash
    aggregation whose key includes the time bucket."""
    return (table(spark, sf_dir, "events")
            .groupBy(_bucket_epoch(F.col("ts"), 3600).cast("long").alias("ws_epoch"),
                     "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                 .cast("double").alias("total_value")))


@register(
    "ts_sliding_window",
    oracle="""
    SELECT ws_epoch, count(*) AS n, count(DISTINCT user_id) AS users
    FROM (
      SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 * o.off AS BIGINT) AS ws_epoch,
             user_id
      FROM events CROSS JOIN (VALUES (0), (1)) AS o(off))
    GROUP BY ws_epoch
    """,
    tags=("time", "streaming-equivalent"),
)
def ts_sliding_window(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): every event lands in
    exactly 2 buckets. Expressed by explicit bucket replication (the
    same expansion ``window(ts,'1 hour','30 minutes')`` performs).
    Replication factor = len/slide — the real cost driver at scale."""
    ev = table(spark, sf_dir, "events")
    return (ev.select(_bucket_epoch(F.col("ts"), 1800).cast("long").alias("base"),
                      "user_id",
                      F.explode(F.array(F.lit(0), F.lit(1))).alias("off"))
            .select((F.col("base") - 1800 * F.col("off")).alias("ws_epoch"), "user_id")
            .groupBy("ws_epoch")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("users")))


@register(
    "ts_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             -- STRICT > : Spark's session_window MERGES two events
             -- exactly gap apart, so a new session starts only when
             -- the gap is exceeded (r07 review; latent-only here —
             -- microsecond timestamps never land exactly 1 day apart
             -- in the synthetic data — but the boundary must match)
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 1 DAY
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("time", "streaming-equivalent"),
)
def ts_session_window(spark, sf_dir):
    """Session window (1-day gap) via ``session_window`` — Spark merges
    events closer than the gap; the oracle reproduces it with
    gaps-and-islands. Session start surfaces as epoch micros (instant,
    not wall time)."""
    return (table(spark, sf_dir, "events")
            .groupBy(F.session_window("ts", "1 day").alias("sw"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.unix_micros(F.col("sw.start")).alias("session_start_us"),
                    "n_events"))


@register(
    "ts_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("time", "streaming-equivalent"),
)
def ts_dedup(spark, sf_dir):
    """Batch semantics of streaming ``dropDuplicates([user_id,
    event_type])`` (keep-any ⇒ compare the distinct key set)."""
    return table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "ts_watermark_recent",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS epoch_day, count(*) AS n
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    GROUP BY 1
    """,
    tags=("time", "streaming-equivalent"),
)
def ts_watermark_recent(spark, sf_dir):
    """Watermark analog: only events within 7 days of the max event time
    survive — the batch shape of ``withWatermark('ts', '7 days')`` late-
    data dropping. The scalar max broadcasts; day buckets are epoch-day
    integers (UTC)."""
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    return (ev.join(F.broadcast(cutoff))
            .filter(F.col("ts") >= F.col("cutoff"))
            .groupBy(F.floor(F.unix_micros("ts") / (86400 * US_PER_S))
                     .cast("long").alias("epoch_day"))
            .agg(F.count("*").alias("n")))


@register(
    "ts_user_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events)
    SELECT a.day AS day, count(*) AS retained_users
    FROM act a JOIN act b
      ON a.user_id = b.user_id AND b.day = a.day + 1
    GROUP BY a.day
    """,
    tags=("time", "analytics"),
)
def ts_user_retention(spark, sf_dir):
    """Next-day retention: users active on day d AND d+1, per day —
    the product-analytics staple. Activity reduces to DISTINCT (user,
    day) before the self-join, so the join input is bounded by
    users×days, not events; the self-join shuffles once on user_id.
    Days are epoch-integer (event-time tz discipline: never output
    wall timestamps from the events table)."""
    ev = table(spark, sf_dir, "events")
    act = (ev.select("user_id",
                     (F.unix_micros(F.col("ts")) / 86400000000)
                     .cast("long").alias("day"))
           .distinct())
    nxt = act.select(F.col("user_id").alias("uid_b"),
                     (F.col("day") - 1).alias("day_b"))
    return (act.join(nxt, (act.user_id == nxt.uid_b)
                     & (act.day == nxt.day_b))
            .groupBy("day")
            .agg(F.count("*").alias("retained_users")))


@register(
    "ts_funnel_view_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS first_view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS first_purchase_us
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > v.first_view_us
        AND epoch_us(e.ts) <= v.first_view_us + 86400000000
      GROUP BY e.user_id)
    SELECT v.user_id, v.first_view_us, p.first_purchase_us
    FROM v JOIN p ON v.user_id = p.user_id
    """,
    tags=("time", "analytics"),
)
def ts_funnel_view_purchase(spark, sf_dir):
    """Two-step funnel: first 'view' followed by a 'purchase' within
    24 hours, per user — sequential-event matching as two aggregates +
    a time-band join (no per-user sort, no window over raw events).
    All event times are epoch-microsecond integers; at scale both
    aggregates and the join share the user_id shuffle key."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("first_view_us")))
    pe = (ev.filter(F.col("event_type") == "purchase")
          .select("user_id", us.alias("p_us"))
          .withColumnRenamed("user_id", "uid_p"))
    p = (pe.join(v, (pe.uid_p == v.user_id)
                 & (pe.p_us > v.first_view_us)
                 & (pe.p_us <= v.first_view_us + 86400000000))
         .groupBy("uid_p").agg(F.min("p_us").alias("first_purchase_us")))
    return (v.join(p, v.user_id == p.uid_p)
            .select("user_id", "first_view_us", "first_purchase_us"))


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                      AS DOUBLE) / count(*), 4) AS k_avg
    FROM events GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def json_props_extract(spark, sf_dir):
    """Ad-hoc JSON path extraction from the events ``props`` column
    (SURVEY §2.B1's dynamic-schema side: get_json_object for paths not
    in the declared schema) aggregated per event type. Integer sums
    exact; avg via the sum-then-divide discipline."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(k).alias("k_sum"),
                 F.round(F.sum(k).cast("double") / F.count("*"), 4)
                 .alias("k_avg")))


@register(
    "ts_resample_ffill",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
    b AS (SELECT user_id, min(us) AS lo, max(us) AS hi
          FROM ev GROUP BY user_id),
    grid AS (
      SELECT user_id,
             unnest(range((lo // 3600000000 + 1) * 3600000000,
                          hi + 1, 3600000000)) AS us
      FROM b),
    u AS (
      SELECT user_id, event_id, us, value, 0 AS is_grid FROM ev
      UNION ALL
      SELECT user_id, NULL, us, NULL, 1 FROM grid),
    f AS (
      SELECT user_id, us, is_grid,
             last_value(value IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY us, is_grid, event_id
                     ROWS UNBOUNDED PRECEDING) AS v
      FROM u)
    SELECT user_id, us AS grid_us, v AS value FROM f WHERE is_grid = 1
    """,
    tags=("time", "resample"),
)
def ts_resample_ffill(spark, sf_dir):
    """Resample each user's event stream onto an hourly grid with
    forward fill — the gap-fill/interpolation op every time-series
    store exposes (here: grid epoch-us points strictly inside the
    user's observed span).

    Scale shape: the grid generates from per-user (min, max) bounds —
    one aggregate, then sequence/explode map-side (never a calendar
    cross join); the fill is ONE window over the union, sharing the
    user_id shuffle. Values pass through untouched (stored doubles —
    bit-exact across engines); grid arithmetic is integer micros.
    Deterministic tie-break: same-instant events resolve by event_id,
    and grid points sort after events at the same instant (is_grid).
    """
    H = 3_600_000_000
    ev = (table(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  F.unix_micros(F.col("ts")).alias("us"), "value"))
    b = ev.groupBy("user_id").agg(F.min("us").alias("lo"),
                                  F.max("us").alias("hi"))
    grid = (b.select("user_id",
                     F.explode(F.sequence(
                         (F.floor(F.col("lo") / H) + 1) * H,
                         F.col("hi"), F.lit(H))).alias("us")))
    u = (ev.select("user_id", "event_id", "us", "value",
                   F.lit(0).alias("is_grid"))
         .unionByName(grid.select(
             "user_id", F.lit(None).cast("long").alias("event_id"), "us",
             F.lit(None).cast("double").alias("value"),
             F.lit(1).alias("is_grid"))))
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id")
         .orderBy("us", "is_grid", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    f = u.withColumn("v", F.last("value", ignorenulls=True).over(w))
    return (f.filter(F.col("is_grid") == 1)
            .select("user_id", F.col("us").alias("grid_us"),
                    F.col("v").alias("value")))


@register(
    "ts_multi_grain_rollup",
    oracle="""
    SELECT CASE WHEN grouping(d) = 0 THEN 'day' ELSE 'hour' END AS grain,
           coalesce(d, h) AS bucket_us,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM (
      SELECT value,
             epoch_us(ts) // 86400000000 * 86400000000 AS d,
             epoch_us(ts) // 3600000000 * 3600000000 AS h
      FROM events)
    GROUP BY GROUPING SETS ((d), (h))
    """,
    tags=("time", "rollup"),
)
def ts_multi_grain_rollup(spark, sf_dir):
    """Multi-grain time rollup in ONE pass: daily and hourly buckets
    via GROUPING SETS over epoch-integer bucket keys — the
    materialized-rollup pattern a metrics store maintains, computed
    without scanning the facts twice. Buckets are epoch-us integers
    (instants; tz discipline per queries/base.py)."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    d = (us - us % 86400000000).alias("d")
    h = (us - us % 3600000000).alias("h")
    base = ev.select(F.col("value"), d, h)
    g = base.groupingSets([["d"], ["h"]], "d", "h")
    return (g.agg(F.count("*").alias("n"),
                  F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                  .cast("double").alias("total_value"),
                  F.grouping("d").alias("_gd"))
            .select(F.when(F.col("_gd") == 0, "day").otherwise("hour")
                    .alias("grain"),
                    F.coalesce("d", "h").alias("bucket_us"),
                    "n", "total_value"))
