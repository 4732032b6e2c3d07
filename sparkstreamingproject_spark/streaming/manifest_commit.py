"""Manifest-last state commit — closes the additive-fold double-count
window (VERDICT r11 §next 4) with plain parquet.

The marker protocol (``idempotent.py`` + ``statestore.swap_in``) has a
documented residual window for ADDITIVE folds: the data swap and the
batch-id marker are two separate renames, so a crash after the swap
lands but before the marker does replays the fold against the
POST-swap state and double-counts that one batch.

This module makes the state pointer and the batch-id watermark ONE
atomic rename — a single-table miniature of what Delta/Iceberg's
commit log does:

  <table>.v-<token>/   immutable state versions (plain parquet)
  <table>.manifest     one JSON line {"version": token, "batch_id": N}
                       — the ONLY mutable name, replaced by atomic
                       ``os.replace``

A merge reads the version the manifest names, writes a NEW version
directory (never touching the old one — so the merge plan's lineage
is never starved), then replaces the manifest. Every crash point is
now exact:

- crash while writing the new version, or after it but BEFORE the
  manifest replace (the old protocol's residual window): the manifest
  still names the pre-merge version AND the pre-merge batch id — the
  replay re-merges from the OLD state; the orphan version dir is
  garbage-collected at the next successful commit;
- crash AFTER the manifest replace: the manifest's batch_id watermark
  names this batch — the replay is skipped.

There is no point at which the state includes a batch the watermark
does not (or vice versa), which is exactly the atomicity the marker
protocol lacked.

Single-writer assumption (same as ``statestore``): Structured
Streaming serializes foreachBatch per query. GC of superseded version
dirs runs inside the committing writer; a production multi-reader
deployment would delay GC by a retention window (as Delta's VACUUM
does) — noted here because this module's readers re-resolve the
manifest per read.

Batch-id watermark, not per-id markers: foreachBatch epoch ids are
monotonically increasing, so `batch_id <= watermark` ⇔ already
committed — one integer replaces the marker directory.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame


def _manifest_path(table_dir: str) -> str:
    return os.path.abspath(table_dir) + ".manifest"


def manifest_info(table_dir: str) -> tuple[str | None, int]:
    """(current version token, last committed batch id); (None, -1)
    before the first commit."""
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return None, -1
    with open(p) as f:
        m = json.load(f)
    return m["version"], int(m["batch_id"])


def state_path(table_dir: str) -> str | None:
    token, _ = manifest_info(table_dir)
    if token is None:
        return None
    return f"{os.path.abspath(table_dir)}.v-{token}"


def read_state(spark, table_dir: str, schema: str | None = None):
    """The committed state relation, or an empty relation of
    ``schema`` (None → Python None) before the first commit."""
    p = state_path(table_dir)
    if p is None or not os.path.isdir(p):
        return None if schema is None else spark.createDataFrame([], schema)
    return spark.read.parquet(p)


def commit_state(merged: DataFrame, table_dir: str, batch_id: int) -> None:
    """Write ``merged`` as a new immutable version and atomically
    repoint manifest+watermark to it. ``merged`` may (and in the
    additive folds does) read the current version — the old version
    dir is never renamed or deleted before the new one is complete
    and committed."""
    table_dir = os.path.abspath(table_dir)
    token = uuid.uuid4().hex[:8]
    merged.write.mode("overwrite").parquet(f"{table_dir}.v-{token}")
    tmp = f"{table_dir}.manifest.tmp-{token}"
    with open(tmp, "w") as f:
        json.dump({"version": token, "batch_id": int(batch_id)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table_dir))  # THE commit point
    _gc(table_dir, keep=token)


def _gc(table_dir: str, keep: str) -> None:
    """Remove superseded version dirs and stale manifest tmps — debris
    from completed or crashed earlier attempts. Never touches the
    version the manifest names."""
    parent, name = os.path.split(table_dir)
    parent = parent or "."
    for d in os.listdir(parent):
        full = os.path.join(parent, d)
        if d.startswith(name + ".v-") and d != f"{name}.v-{keep}":
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(name + ".manifest.tmp-"):
            os.remove(full)


def manifest_foreach_batch(merge_fn, table_dir: str):
    """Wrap a ``(batch_df, batch_id) -> None`` merge (which must end
    in ``commit_state(..., batch_id)``) so batch ids at or below the
    committed watermark are skipped."""
    def wrapped(batch_df, batch_id: int) -> None:
        _, watermark = manifest_info(table_dir)
        if int(batch_id) <= watermark:
            return  # replay of a committed batch
        merge_fn(batch_df, batch_id)

    return wrapped
