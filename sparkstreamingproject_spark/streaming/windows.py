"""Event-time windowed aggregations + watermarks (SURVEY.md §2.F gaps).

The reference has no event-time processing at all (raw epoch-ms Longs,
processing-time micro-batches only). These are the built-ins our engine
exposes; each has a batch-equivalent query in ``queries.timeseries``
that the DuckDB oracle verifies, per the strategy in SURVEY.md §5.1 —
design streaming ops batch-first, then reuse the same expression under
``readStream``.

State-store sizing note (100 TB): watermarks bound state. A 1-hour
tumbling window with a 1-hour watermark keeps ≤2 windows of state per
key; session windows keep one open session per key. Without the
watermark, state grows forever — every function here requires one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    window_len: str = "1 hour",
                    watermark: str = "1 hour",
                    extra_keys: list[str] | None = None) -> DataFrame:
    keys = [F.window(ts_col, window_len).alias("w")] + (extra_keys or [])
    return (events.withWatermark(ts_col, watermark)
            .groupBy(*keys)
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    *(extra_keys or []), "n"))


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   window_len: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window_len, slide).alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "n"))


def session_counts(events: DataFrame, key: str, ts_col: str = "ts",
                   gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(ts_col, gap).alias("sw"), key)
            .agg(F.count("*").alias("n_events"))
            .select(key, F.col("sw.start").alias("session_start"), "n_events"))


def stream_dedup(events: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming dropDuplicates: state bounded by the watermark — a key
    is remembered only until its event time passes out of the window."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)
