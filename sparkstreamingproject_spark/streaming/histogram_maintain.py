"""Streaming histogram-sketch maintenance — per-micro-batch additive
fold of the fixed-bin value histogram (``queries/sketches2.py``), the
quantile companion to ``hll_maintain`` (distinct) and
``rollup_maintain`` (sums).

Bin counts merge by ADDITION, so like the daily rollup this fold is
NOT naturally idempotent under an uncommitted-batch replay — it runs
under the per-batch-id marker (``idempotent_foreach_batch``), and the
table swap is the crash-safe rename-aside from ``statestore``. State
is ≤ HQ_BINS rows forever; any quantile reads off the maintained
relation without touching history — the sketch property that makes
percentile dashboards feasible over a 100 TB stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.sketches2 import value_bins
from .idempotent import idempotent_foreach_batch
from .statestore import swap_in, table_exists


def merge_histogram(batch: DataFrame, table_dir: str) -> None:
    """Fold one micro-batch's (bin, n) partials into the persisted
    histogram by keyed addition — state ⊕ batch₁ ⊕ batch₂ equals the
    batch-recomputed histogram of all rows (associativity)."""
    spark = batch.sparkSession
    part = value_bins(batch)
    if table_exists(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (base.unionByName(part)
                  .groupBy("bin").agg(F.sum("n").alias("n")))
    else:
        merged = part
    swap_in(merged.coalesce(1), table_dir)


def histogram_rollup_stream(events_stream: DataFrame, table_dir: str,
                            checkpoint_dir: str):
    """Wire a streaming events source into the marker-guarded
    histogram fold (availableNow)."""
    fold = idempotent_foreach_batch(
        lambda b, _id: merge_histogram(b, table_dir),
        marker_dir=f"{checkpoint_dir}/_hist_markers")
    return (events_stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
