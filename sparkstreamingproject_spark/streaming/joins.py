"""Stream-stream and stream-static joins (SURVEY.md §2.F gap list —
the reference has no joins at all; its Redis dim store exists precisely
to emulate stream-static enrichment by hand).

- stream-static: the DIM:* pattern — a streaming fact joined to a
  batch dim table; Spark re-resolves the dim per micro-batch, so a
  MERGE-maintained dim table gives the same freshness as the
  reference's per-batch Redis reads (F3) without the external store.
- stream-stream: both sides buffered in watermark-bounded state; the
  time-range condition bounds how long a row waits for its match.
  State size ≈ input-rate × watermark horizon per side — the watermark
  is not optional at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on,
                         how: str = "left") -> DataFrame:
    """Stream-static join: dims broadcast per micro-batch."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_join(left: DataFrame, right: DataFrame,
                       left_ts: str = "ts", right_ts: str = "ts",
                       key: str = "user_id",
                       left_watermark: str = "1 hour",
                       right_watermark: str = "1 hour",
                       within: str = "30 minutes") -> DataFrame:
    """Inner stream-stream join on a key within a time range.

    The time-range predicate (`right.ts` ∈ [left.ts, left.ts+within])
    lets the engine drop buffered state as the watermark advances —
    without it, both sides buffer forever.
    """
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner")


def stream_stream_left_join(left: DataFrame, right: DataFrame,
                            left_ts: str = "ts", right_ts: str = "ts",
                            key: str = "user_id",
                            left_watermark: str = "1 hour",
                            right_watermark: str = "1 hour",
                            within: str = "30 minutes") -> DataFrame:
    """LEFT OUTER stream-stream join on a key within a time range.

    Matched pairs emit as they meet; an UNMATCHED left row emits with
    a null right side only once the watermark proves no match can
    still arrive (left.ts + within < right watermark) — so null rows
    are watermark-delayed by construction, and the join cannot emit a
    false null early. Same state bound as the inner form: each side
    buffers ≈ input-rate × watermark horizon; the time-range predicate
    is what lets the engine evict, and is mandatory for outer joins
    (Spark rejects an outer stream-stream join without one).
    """
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "leftOuter")
