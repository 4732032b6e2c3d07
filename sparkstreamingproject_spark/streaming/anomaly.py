"""Streaming anomaly detection: event-time daily counts z-scored
against a static baseline-stats table.

The production pattern: baseline statistics (per-key mean/std of daily
counts) live in a small dimension table refreshed periodically by the
batch pipeline (the batch-first counterpart is
``queries/analytics4.py:ts_anomaly_zscore``); the live stream windows
to the same epoch-aligned day buckets, broadcast-joins the stats, and
flags |z| ≥ 2 as each day's watermark closes it. State is one open
window per event_type (watermark-bounded), and the baseline join is a
broadcast — the stream never shuffles against history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def daily_count_baseline(history: DataFrame, key: str = "event_type",
                         ts_col: str = "ts") -> DataFrame:
    """Per-key mean/std of daily counts from a batch history table —
    the (tiny) stats dimension the stream broadcasts. Collapses the
    history to |keys|×|days| partials map-side, then |keys| rows."""
    daily = (history.groupBy(
        key, F.floor(F.unix_micros(ts_col) / US_PER_DAY)
        .cast("long").alias("day"))
        .agg(F.count("*").alias("n")))
    return (daily.groupBy(key)
            .agg(F.avg("n").alias("mu"),
                 F.stddev_samp("n").alias("sigma")))


def zscore_flags(daily: DataFrame, baseline: DataFrame,
                 key: str = "event_type", z_threshold: float = 2.0) -> DataFrame:
    """Broadcast-join daily counts to the baseline and flag anomalies
    on the 4dp-rounded z (same rounding discipline as the batch
    query so stream and batch make identical boundary calls)."""
    sigma = F.col("sigma")
    z = F.round(F.when(sigma == 0, F.lit(None))
                .otherwise((F.col("n") - F.col("mu")) / sigma), 4)
    return (daily.join(F.broadcast(baseline), key)
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("z")) >= z_threshold,
                                   F.lit(False)))
            .select(key, "day", "n", "z", "is_anomaly"))


def anomaly_stream(events: DataFrame, baseline: DataFrame,
                   ts_col: str = "ts", key: str = "event_type",
                   watermark: str = "1 day",
                   z_threshold: float = 2.0) -> DataFrame:
    """Streaming form: watermarked 1-day tumbling counts per key →
    broadcast stats join → z flag. ``F.window`` day buckets are
    epoch-aligned, so ``unix_micros(window.start) / day`` equals the
    batch query's ``floor(unix_micros(ts) / day)`` bucket exactly."""
    daily = (events.withWatermark(ts_col, watermark)
             .groupBy(F.window(ts_col, "1 day").alias("w"), key)
             .agg(F.count("*").alias("n"))
             .select(key,
                     (F.unix_micros(F.col("w.start")) / US_PER_DAY)
                     .cast("long").alias("day"),
                     "n"))
    return zscore_flags(daily, baseline, key, z_threshold)
