"""Idempotent foreachBatch sink — effectively-once on top of
at-least-once.

Structured Streaming replays the in-flight micro-batch after a crash
(same batch_id, same data). A non-transactional sink (plain parquet
append) would double-write. The reference has exactly this exposure —
its flush-then-commit ordering (``OdsBaseLogApp.scala:194,205``) gives
at-least-once, and its Kafka consumers must dedup downstream.

This wrapper commits a marker per (sink, batch_id) AFTER the write
succeeds, and skips batches whose marker exists. Marker write is an
atomic rename, so a crash between write and marker leaves the batch
unmarked → it replays → the sink must tolerate a partial previous
attempt. Parquet appends are directory-additive, so replays can leave
orphan files from the failed attempt; production table formats
(Delta/Iceberg) make the data+marker commit atomic — this wrapper is
the parquet-only approximation and documents the gap honestly.

For single-table ADDITIVE state (where a replay against post-commit
state double-counts), ``manifest_commit.py`` closes the window
entirely with plain parquet: immutable state versions + one atomic
manifest rename carrying both the version pointer and the batch-id
watermark. The DSIR fold uses it. Since r13 the multi-directory CDC
router also commits through one manifest
(``manifest_commit.cdc_commit`` — every per-topic fact partition and
dim snapshot of a batch becomes visible in one rename), so this
wrapper no longer guards any in-tree sink; it remains as the
documented baseline protocol for external appending sinks where a
manifest-reading client is not an option.
"""

from __future__ import annotations

import os
import uuid


def idempotent_foreach_batch(write_fn, marker_dir: str):
    """Wrap a ``(batch_df, batch_id) -> None`` writer so replayed batch
    ids are skipped once their marker is committed."""
    os.makedirs(marker_dir, exist_ok=True)

    def wrapped(batch_df, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return  # replay of a fully-committed batch
        write_fn(batch_df, batch_id)
        tmp = f"{marker}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, marker)

    return wrapped
