"""Small-file compaction for append-mode streaming outputs.

The idempotent streaming writers (``dedup_ingest``, ``ivf_ingest``)
land every micro-batch in its own ``ingest_batch=<id>`` partition —
the layout that makes crashed-batch retries overwrite-in-place. The
cost is file explosion: one-plus files per batch forever, and at a
few-seconds trigger that is tens of thousands of tiny files per day —
the classic day-2 operational problem of streaming lakes (every scan
pays per-file open cost; the namenode/listing pays per-object).

``compact_batched_output`` folds all COMMITTED batch partitions into a
single consolidated ``ingest_batch=-1`` partition while leaving the
most recent ``keep_last`` batch partitions untouched:

- Structured Streaming can only ever replay the uncommitted tail, so
  partitions older than that horizon are immutable history — safe to
  consolidate. ``keep_last`` should be ≥ the number of batches the
  checkpoint could replay (1 in practice; default 2 for margin).
- The retry contract survives: a replayed batch id still overwrites
  its own (kept) partition, and the self-exclusion read filter
  (``ingest_batch != id``) can never match the consolidated ``-1``.
- Reads see the identical relation before and after — only the file
  layout changes.

Crash-safety rides the same rename-aside swap as the state tables
(``statestore.swap_in`` with ``partition_by`` preserving the layout):
any crash leaves the old or the new table adoptable, never neither.
Single-writer assumption as everywhere in this package: run compaction
between micro-batches (e.g. from the maintenance window of the job
itself), not concurrently with a fold.

On a lakehouse format this module is ``OPTIMIZE``/``rewrite_data_files``;
the parquet form keeps the operational story honest in this container.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import os

from .statestore import _recover
from .statestore import swap_in as _swap_in

#: partition id the consolidated history lands in — no real foreachBatch
#: epoch is ever negative, so retry self-exclusion can never mask it
CONSOLIDATED = -1


def compact_batched_output(spark: SparkSession, table_dir: str,
                           keep_last: int = 2,
                           target_files: int = 1,
                           sub_partition_by: list[str] | None = None
                           ) -> dict:
    """Consolidate committed ``ingest_batch`` partitions of
    ``table_dir`` into one ``ingest_batch=-1`` partition, keeping the
    newest ``keep_last`` batch partitions replayable.
    ``sub_partition_by`` preserves a nested partition layout under the
    batch level (e.g. the IVF postings' ``cell=`` dirs, which probe
    pruning depends on). Returns a small stats dict (batches
    folded/kept, row count). No-op when there is nothing to fold."""
    # adopt any interrupted-swap debris first; then a RECURSIVE data
    # probe (statestore.table_exists checks only the top level — right
    # for flat state tables, wrong for ingest_batch=* partition dirs)
    _recover(table_dir)
    has_data = any(f.endswith(".parquet")
                   for _r, _d, fs in os.walk(table_dir) for f in fs)
    if not has_data:
        return {"folded": 0, "kept": 0, "rows": 0}
    df = spark.read.parquet(table_dir)
    if "ingest_batch" not in df.columns:
        raise ValueError(
            f"{table_dir} has no ingest_batch partition column — "
            "compaction only applies to batch-partitioned outputs")
    # distinct partition ids: bounded by batch count (partition-pruned
    # listing, not a data scan over row payloads)
    ids = sorted(r[0] for r in
                 df.select("ingest_batch").distinct().collect())
    tail = [i for i in ids if i != CONSOLIDATED][-keep_last:] \
        if keep_last > 0 else []
    fold_ids = [i for i in ids if i not in tail]
    if not fold_ids or fold_ids == [CONSOLIDATED]:
        return {"folded": 0, "kept": len(tail),
                "rows": df.count()}
    folded = (df.filter(~F.col("ingest_batch").isin(tail))
              .withColumn("ingest_batch", F.lit(CONSOLIDATED))
              .coalesce(target_files))
    new = folded.unionByName(df.filter(F.col("ingest_batch").isin(tail)))
    _swap_in(new, table_dir,
             partition_by=["ingest_batch"] + list(sub_partition_by or []))
    return {"folded": len(fold_ids), "kept": len(tail),
            "rows": spark.read.parquet(table_dir).count()}
