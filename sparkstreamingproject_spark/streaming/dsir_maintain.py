"""Streaming DSIR model-state maintenance.

The DSIR importance model (``queries/llm14.py:curation_dsir_importance``)
is {B} hashed-bigram bucket counters for the raw corpus and the target
slice — a model whose state is {B} rows REGARDLESS of corpus size.
This module keeps that state current from a streaming documents source
so newly-landed documents can be importance-scored immediately against
statistics of everything ever ingested — the online form of the
pipeline (score-at-ingest), vs the batch query's train-time form.

The fold is ADDITIVE (bucket counters), which is exact under
exactly-once batch delivery but double-counts on a replayed
micro-batch — so the writer is wrapped in the per-batch-id idempotence
marker (``streaming/idempotent.py``), the same upgrade the additive
rollup folds use. Contrast with the retention bitmap / HLL folds where
bit_or / max are idempotent and need no marker. Residual window: the
marker is the parquet-only approximation documented in
``idempotent.py`` — a crash after ``swap_in`` completes but before the
marker rename lands replays the fold against the POST-swap state and
double-counts that one batch. Delta/Iceberg's atomic data+marker
commit closes it; with plain parquet the window is narrow (two local
renames apart) but real.

At 100 TB: the per-batch partial is a map-side-combinable aggregate to
≤ {B} rows; the merge touches a {B}-row table; scoring joins documents
to a broadcast of that table. Nothing here scales with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.llm14 import dsir_bucket_stats, dsir_doc_buckets
from .idempotent import idempotent_foreach_batch
from .statestore import swap_in as _swap_in
from .statestore import table_exists as _table_exists


def merge_dsir_stats(batch: DataFrame, table_dir: str) -> None:
    """Fold one micro-batch's bucket counters into the model state.
    Additive — callers MUST wrap with the idempotence marker (see
    ``dsir_stats_stream``) or a replayed batch double-counts."""
    spark = batch.sparkSession
    part = dsir_bucket_stats(dsir_doc_buckets(batch))
    if _table_exists(table_dir):
        base = spark.read.parquet(table_dir)
        merged = (base.unionByName(part)
                  .groupBy("bucket")
                  .agg(F.sum("c_raw").cast("long").alias("c_raw"),
                       F.sum("c_tgt").cast("long").alias("c_tgt")))
    else:
        merged = part
    _swap_in(merged.coalesce(1), table_dir)


def dsir_stats_stream(docs_stream: DataFrame, table_dir: str,
                      checkpoint_dir: str, marker_dir: str):
    """Wire a streaming documents source into the marker-guarded
    additive stats fold."""
    write = idempotent_foreach_batch(
        lambda b, _id: merge_dsir_stats(b, table_dir), marker_dir)
    return (docs_stream.writeStream
            .foreachBatch(write)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def score_against_model(docs: DataFrame, table_dir: str) -> DataFrame:
    """Importance-score a document set against the maintained model —
    the identical arithmetic as the batch query (``dsir_weights``)."""
    from ..queries.llm14 import dsir_weights
    stats = docs.sparkSession.read.parquet(table_dir)
    return dsir_weights(dsir_doc_buckets(docs), stats)
