"""Streaming incremental rollup maintenance — the streaming form of
the `agg_incremental_merge` batch query: a foreachBatch sink that folds
each micro-batch's partial aggregate into a persisted daily rollup by
additive MERGE, so the rollup stays current without ever rescanning
history.

Contrast with `dim_upsert.upsert_dim_parquet` (LWW — newest row wins):
a rollup merge is ADDITIVE (sum/count combine), which is only correct
under exactly-once micro-batch semantics — Structured Streaming's
checkpoint guarantees each batch folds in once (a replayed batch after
a crash is re-executed with the same batchId; the idempotence marker
pattern from `streaming/idempotent.py` guards the at-least-once sinks).

At scale the state side is a date-partitioned rollup table and the
batch touches a handful of recent partitions — MERGE with partition
pruning on a lakehouse format; here the container-friendly parquet
swap rewrites the (dimension-sized) rollup atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .statestore import swap_in as _swap_in
from .statestore import table_exists as _table_exists


def merge_rollup(batch: DataFrame, table_dir: str) -> None:
    """Fold one micro-batch of orders into the daily rollup: partial
    aggregate the batch (integer cents — order-free), then combine
    with the persisted state by key. Additive, so state ⊕ batch₁ ⊕
    batch₂ ≡ recompute over all rows (associativity — the invariant
    `agg_incremental_merge`'s oracle pins)."""
    spark = batch.sparkSession
    part = (batch.groupBy(F.to_date("o_orderdate").alias("day"))
            .agg(F.sum(F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT)"))
                .alias("cents"),
                F.count("*").alias("n")))
    if _table_exists(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (base.unionByName(part)
                  .groupBy("day")
                  .agg(F.sum("cents").alias("cents"),
                       F.sum("n").alias("n")))
    else:
        merged = part
    _swap_in(merged, table_dir)


def maintain_rollup_stream(orders_stream: DataFrame, table_dir: str,
                           checkpoint_dir: str,
                           trigger_seconds: int | None = None):
    """writeStream.foreachBatch wrapper: every micro-batch folds into
    the rollup. Unlike the LWW/SCD2/HLL-max sinks, the additive fold
    is NOT naturally idempotent — a crash after the swap completes but
    before the checkpoint commits would re-fold the batch on replay —
    so the fold runs under the per-batch-id marker from
    ``idempotent.idempotent_foreach_batch``: a fully-committed batch id
    is skipped on replay. (The marker itself commits via atomic rename
    AFTER the swap; the residual crash window between swap and marker
    is the parquet-level approximation that a lakehouse MERGE commit
    closes — documented in ``idempotent.py``.)"""
    from .idempotent import idempotent_foreach_batch
    fold = idempotent_foreach_batch(
        lambda b, _id: merge_rollup(b, table_dir),
        marker_dir=f"{checkpoint_dir}/_rollup_markers")
    writer = (orders_stream.writeStream
              .foreachBatch(fold)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
