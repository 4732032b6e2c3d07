"""Batch-equivalent oracle rows for streaming semantics that were
previously pytest-only (VERDICT r06 §next 6b).

The streaming suite proves stream≡batch for session windows and
stream-stream joins behaviorally; these queries pin the SAME contracts
through the driver's DuckDB oracle, so the append-mode emission rules
themselves (watermark closure, join time-bounds) carry a CORRECTNESS
row. Reference context: the DStream apps' only late-data story is
Kafka replay (``OdsBaseLogApp.scala:85-207``); Structured Streaming's
watermark contract is the engine-native upgrade this repo documents.

Registered AFTER the r07 driver window (positions ≥ 50) — the ledger
closes first; these certify in r08.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

# gap that merges events into a session / delay the watermark lags the
# max event time — sized for the 30-day synthetic events span so both
# the emitted and the still-open sets are non-empty at every test SF
_GAP_S = 3600
_DELAY_S = 3 * 86400


@register(
    "stream_session_late_closed",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             -- STRICT > : Spark's session_window MERGES two events
             -- exactly gap apart (verified empirically), so a new
             -- session starts only when the gap is exceeded
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL {_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), g AS (SELECT epoch_us(max(ts)) AS wm_us FROM events)
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           count(*) AS n_events
    FROM numbered, g
    GROUP BY user_id, session_id, g.wm_us
    HAVING epoch_us(max(ts)) + {_GAP_S}::BIGINT * 1000000 <= wm_us
           - {_DELAY_S}::BIGINT * 1000000
    """,
    tags=("time", "streaming-equivalent"),
)
def stream_session_late_closed(spark, sf_dir):
    """Append-mode emission set of a WATERMARKED streaming session
    aggregation (``streaming/windows.py:session_counts`` with a
    3-day watermark): a session row is emitted exactly when the
    watermark (max event time − delay) passes the session END (last
    event + gap) — sessions still inside the late-data horizon stay
    open and unemitted, which is what makes late arrivals mergeable.
    The batch mirror builds the same sessions (``session_window``
    merges events closer than the gap) and keeps only the closed set.
    Scale: one shuffle by user for the sessionization; the watermark
    cutoff is a broadcast scalar filter on the session aggregate —
    state in the streaming form is bounded by the horizon, the batch
    form by the session count, never raw rows."""
    ev = table(spark, sf_dir, "events")
    gmax = ev.agg(F.unix_micros(F.max("ts")).alias("wm_us"))
    s = (ev.groupBy(F.session_window("ts", f"{_GAP_S} seconds").alias("sw"),
                    "user_id")
         .agg(F.count("*").alias("n_events")))
    return (s.crossJoin(F.broadcast(gmax))
            .filter(F.unix_micros(F.col("sw.end"))
                    <= F.col("wm_us") - _DELAY_S * 1_000_000)
            .select("user_id",
                    F.unix_micros(F.col("sw.start"))
                    .alias("session_start_us"),
                    "n_events"))


_JOIN_WINDOW_S = 24 * 3600


@register(
    "stream_join_click_purchase_window",
    oracle=f"""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT c.user_id, c.cus, p.pus
      FROM c JOIN p ON p.user_id = c.user_id
       AND p.pus >= c.cus
       AND p.pus <= c.cus + {_JOIN_WINDOW_S}::BIGINT * 1000000)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum((pus - cus) // 1000000) AS BIGINT) AS sum_gap_s
    FROM j
    """,
    tags=("join", "temporal", "streaming-equivalent"),
)
def stream_join_click_purchase_window(spark, sf_dir):
    """The inner stream-stream join contract
    (``streaming/joins.py:stream_stream_join``): click ⋈ purchase on
    user within [click, click + 24 h] — the exact pair set a
    watermarked stream-stream join emits once both watermarks pass
    (time bounds are what let the engine expire join state; an
    unbounded stream join would hold every row forever). The batch
    mirror is the same equi-join on user with the range predicate as a
    residual filter — a hash join keyed on user_id, NEVER a cartesian;
    per-user activity bounds the pair fan-out at any corpus size.
    Σgap is an exact integer (seconds ≤ 86400 × pairs — int64-safe to
    ~1e14 pairs)."""
    ev = table(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", F.unix_micros("ts").alias("cus")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("pu"),
                 F.unix_micros("ts").alias("pus")))
    j = c.join(p, (F.col("pu") == F.col("user_id"))
               & (F.col("pus") >= F.col("cus"))
               & (F.col("pus") <= F.col("cus")
                  + _JOIN_WINDOW_S * 1_000_000))
    return j.agg(F.count("*").alias("n_pairs"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.expr("(pus - cus) div 1000000"))
                 .cast("long").alias("sum_gap_s"))
