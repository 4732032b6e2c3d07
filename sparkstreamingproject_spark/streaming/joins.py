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
- fold #15 (`joined_stream_to_table`, VERDICT r12 §next 6): the join
  RESULT maintained as a queryable table with the manifest-last
  commit discipline of folds #10-14 — each micro-batch of matches
  lands under an uncommitted ``facts/commit=<token>`` dir and becomes
  visible in one atomic manifest rename (reusing
  ``manifest_commit.cdc_commit`` with no dim side), so a crash
  mid-batch leaves readers on the pre-batch output and the engine's
  replay (join state + offsets both live in the checkpoint, so the
  replayed micro-batch is bit-identical) converges — stream≡batch
  exact, drilled in tests/test_scale_patterns.py.
"""

from __future__ import annotations

import os
import uuid

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


def write_joined_batch(batch: DataFrame, batch_id: int,
                       out_dir: str) -> None:
    """One micro-batch of join output → an uncommitted
    ``facts/commit=<token>`` dir, published by the atomic manifest
    rename (``cdc_commit`` with an empty dim side). Empty batches
    commit only the watermark."""
    from .manifest_commit import cdc_commit
    token = uuid.uuid4().hex[:8]
    path = os.path.join(out_dir, "facts", f"commit={token}")
    (batch.withColumn("batch_id", F.lit(int(batch_id)))
     .write.mode("overwrite").parquet(path))
    has_rows = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(path) for f in files)
    cdc_commit(out_dir, batch_id, token if has_rows else None, {})


def joined_stream_to_table(joined: DataFrame, out_dir: str,
                           checkpoint: str):
    """Fold #15: maintain a stream-stream join result as a
    manifest-committed table (availableNow). Read it back with
    ``manifest_commit.read_cdc_facts(spark, out_dir, schema)`` —
    uncommitted crash debris is invisible by construction. The join
    operator's own state (both buffered sides) lives in the engine's
    checkpoint; this sink adds the output-side atomicity the plain
    parquet sink's file log provides only for its own readers."""
    from .manifest_commit import cdc_foreach_batch
    os.makedirs(out_dir, exist_ok=True)
    fold = cdc_foreach_batch(
        lambda b, i: write_joined_batch(b, i, out_dir), root=out_dir)
    return (joined.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
