"""Streaming OHLC bar maintenance — per-micro-batch fold of the
candlestick bars (``queries/analytics27.py:ts_ohlc_bars``), the fourth
state-fold shape in the maintain family: not additive (rollup /
histogram), not max-merge (HLL), not coalescing (sessionize) — a
MIN/MAX-BY merge where open/close carry their tie-break keys so
partial bars from any micro-batch split fold to the batch answer.

State is one row per (brand, bar) holding ``min(struct(tick, cents))``
/ ``max(struct(tick, cents))`` extrema plus additive volume/tick
counts — bounded by bars × brands forever, while the tick stream it
summarizes is unbounded. Volume/count addition makes the fold
non-idempotent under an uncommitted-batch replay, so it runs under the
per-batch-id marker (``idempotent_foreach_batch``) with the crash-safe
rename-aside swap (``statestore``), same contract as the histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..queries.analytics27 import finalize_bars, merge_bars, tick_bars
from .idempotent import idempotent_foreach_batch
from .statestore import swap_in, table_exists


def merge_ohlc(batch_ticks: DataFrame, table_dir: str) -> None:
    """Fold one micro-batch of ticks (brand, bar, cents, qty, tick)
    into the persisted bars: state ⊕ batch₁ ⊕ batch₂ equals the
    batch-recomputed bars of all ticks (struct-min/max and sums are
    associative and commutative)."""
    spark = batch_ticks.sparkSession
    part = tick_bars(batch_ticks)
    if table_exists(table_dir):
        base = spark.read.parquet(table_dir)
        merged = merge_bars(base.unionByName(part))
    else:
        merged = part
    swap_in(merged.coalesce(1), table_dir)


def read_bars(spark, table_dir: str) -> DataFrame:
    """The user-facing OHLC schema off the maintained state (drops the
    tie-break keys)."""
    return finalize_bars(spark.read.parquet(table_dir))


def ohlc_stream(tick_stream: DataFrame, table_dir: str,
                checkpoint_dir: str):
    """Wire a tick stream (already shaped brand/bar/cents/qty/tick,
    e.g. ``analytics27.lineitem_ticks`` semantics) into the
    marker-guarded bar fold (availableNow)."""
    fold = idempotent_foreach_batch(
        lambda b, _id: merge_ohlc(b, table_dir),
        marker_dir=f"{checkpoint_dir}/_ohlc_markers")
    return (tick_stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
