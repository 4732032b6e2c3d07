"""Crash-safe atomic swap for parquet-backed state tables.

``dim_upsert`` / ``hll_maintain`` / ``kmv_maintain`` /
``retention_maintain`` keep small state relations (dim versions, HLL
registers, bottom-k samples, bitmaps — all replay-idempotent merges)
as plain parquet directories and replace them wholesale per
micro-batch. The
naive swap — write tmp, ``rmtree(table_dir)``, ``rename(tmp,
table_dir)`` — has a crash window between the rmtree and the rename
where NO table exists: on foreachBatch replay (the batch never
committed to the checkpoint) the merge sees an empty table and
silently drops every earlier batch's state.

The swap here closes that window with rename-aside + recovery:

1. write the merged state to ``<table>.tmp-<token>`` (this is what
   materializes the plan, so it still READS the current table);
2. rename the current table aside to ``<table>.old-<token>``;
3. rename the tmp in as the table;
4. delete the old dir last.

Every crash point now leaves a recoverable layout, adopted by
``table_exists`` (which all callers invoke before reading state):

- crash in/after (1): table intact, orphan ``.tmp-*`` → deleted;
- crash between (2) and (3): table missing but ``.old-*`` is the
  complete prior state → renamed back; the replayed batch redoes the
  merge against it;
- crash between (3) and (4): table is the NEW state, ``.old-*`` is a
  completed-swap leftover → deleted. The replayed batch re-merges an
  already-merged batch — a no-op for LWW/SCD2/HLL-max merges, which is
  why those folds stay on this swap. Replay-SENSITIVE single-table
  folds (additive rollup/histogram, min/max-by OHLC, decayed trending,
  session merge, DSIR) moved to ``manifest_commit.py`` in r12, whose
  single atomic rename carries state + batch watermark together;
  ``idempotent.idempotent_foreach_batch``'s per-batch markers remain
  for multi-directory sinks (CDC router).

Single-writer assumption: Structured Streaming serializes foreachBatch
invocations per query, so recovery never races an in-flight swap. On a
lakehouse format (Delta/Iceberg) steps 1-4 are one atomic MERGE commit
and this module disappears; the parquet form keeps the 100 TB
operational story honest in a container without those jars.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def _recover(table_dir: str) -> None:
    """Adopt/clean artifacts of an interrupted swap (see module doc).
    Called by ``table_exists`` so every read observes a consistent
    table. Idempotent; cheap (one listdir) when there is no debris."""
    table_dir = os.path.abspath(table_dir)
    parent, name = os.path.split(table_dir)
    if not os.path.isdir(parent):
        return
    olds = sorted(d for d in os.listdir(parent)
                  if d.startswith(name + ".old-"))
    if olds and not os.path.isdir(table_dir):
        # crash between rename-aside and rename-in: the .old dir IS the
        # complete prior state. (At most one .old can exist here — each
        # batch recovers before swapping, so debris never accumulates.)
        os.rename(os.path.join(parent, olds.pop()), table_dir)
    for d in olds:  # completed-swap leftovers
        shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    for d in os.listdir(parent):  # incomplete tmp writes
        if d.startswith(name + ".tmp-"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def table_exists(table_dir: str) -> bool:
    _recover(table_dir)
    if not os.path.isdir(table_dir):
        return False
    # recurse: a table swapped in with partition_by keeps its .parquet
    # files under partition subdirectories, not the top level (ADVICE
    # r07 — a flat listdir would read a partitioned state table as
    # nonexistent and silently reset state)
    for _root, _dirs, files in os.walk(table_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def swap_in(merged: DataFrame, table_dir: str,
            partition_by: list[str] | None = None) -> None:
    """Replace ``table_dir`` with ``merged`` atomically-enough that a
    crash at any point leaves either the old or the new state
    recoverable (never neither). ``partition_by`` preserves a
    partitioned layout (e.g. the ``ingest_batch=`` dirs the streaming
    ingest writers rely on for idempotent retries)."""
    table_dir = os.path.abspath(table_dir)
    # recover HERE too, not only in table_exists: the at-most-one-.old
    # invariant must hold locally even for a caller that writes without
    # reading first, or a crash mid-swap could strand TWO .old dirs and
    # make the next recovery's choice arbitrary. (merged's lineage reads
    # the live table dir, which recovery only ever restores, never
    # moves — safe before the write.)
    _recover(table_dir)
    token = uuid.uuid4().hex[:8]
    tmp = f"{table_dir}.tmp-{token}"
    # materializes the plan — the LAST moment merged still reads the
    # current table, so the renames below cannot starve its lineage
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{table_dir}.old-{token}"
    if os.path.isdir(table_dir):
        os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
