"""Streaming observability — the operational surface every production
stream needs beside its sinks: per-micro-batch progress capture via
``StreamingQueryListener`` (the Spark-native hook), plus health
summaries and threshold alerts over the captured history.

At 100 TB this is how a 1000-executor streaming job is actually run:
batch duration creeping toward the trigger interval means falling
behind; state-operator row growth that never plateaus means a leak
(missing watermark or TTL); input-rate vs processed-rate divergence
means backpressure. The listener receives exactly these numbers from
the engine per batch — no extra jobs, no polling the query object —
and this module turns them into a queryable relation.

The recorder keeps a bounded in-memory deque and (optionally) appends
JSON lines to a file, so history survives the driver for post-mortems.
Listener callbacks run on the engine's event bus thread — they must
never block or touch the SparkSession; the recorder only appends to a
local buffer.
"""

from __future__ import annotations

import json
import threading
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Capture per-batch ``StreamingQueryProgress`` into a bounded
    buffer (and optional JSONL file). Register with
    ``spark.streams.addListener(rec)``; remove with
    ``spark.streams.removeListener(rec)``."""

    def __init__(self, max_batches: int = 1000,
                 jsonl_path: str | None = None):
        self._rows: deque = deque(maxlen=max_batches)
        # rows captured but not yet written to the JSONL file; the
        # callback only appends here (ADVICE r07: file I/O on the
        # event-bus thread stalls the shared listener bus for every
        # query) — the read side (rows()/flush()) does the writing.
        # Bounded to the same max_batches as _rows (ADVICE r08: a
        # long-running query with no reader must not grow without
        # bound); overflow drops the OLDEST pending row and is counted
        # in dropped_pending so the post-mortem knows the JSONL has a
        # gap.
        self._pending: deque = deque(maxlen=max_batches)
        self.dropped_pending: int = 0
        self._lock = threading.Lock()
        self._jsonl_path = jsonl_path

    # -- listener callbacks (event-bus thread: append-only, no Spark) --
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": int(p.batchId),
            "timestamp": p.timestamp,
            "num_input_rows": int(p.numInputRows),
            "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
            "processed_rows_per_second":
                float(p.processedRowsPerSecond or 0.0),
            "batch_duration_ms": int(p.batchDuration),
            "state_rows_total": int(sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or []))),
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        with self._lock:
            self._rows.append(row)
            if self._jsonl_path:
                if len(self._pending) == self._pending.maxlen:
                    self.dropped_pending += 1
                self._pending.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        # Terminal event, off the per-batch hot path: persist whatever
        # is buffered so a crash/stop still leaves the post-mortem
        # JSONL populated even if no reader ever called rows()
        # (ADVICE r08).
        self.flush()

    # -- read side ----------------------------------------------------
    def flush(self) -> int:
        """Write buffered rows to the JSONL file (caller's thread, not
        the event bus). Returns the number of lines written. ``rows()``
        calls this, so any read of the history persists it too."""
        if not self._jsonl_path:
            return 0
        with self._lock:
            pending = list(self._pending)
            self._pending.clear()
        if pending:
            with open(self._jsonl_path, "a") as f:
                for row in pending:
                    f.write(json.dumps(row) + "\n")
        return len(pending)

    def rows(self) -> list[dict]:
        self.flush()
        with self._lock:
            return list(self._rows)


def health_report(rows: list[dict]) -> dict:
    """Summarize captured progress: totals, throughput, the slowest
    batch, and state growth between first and last batch (a state
    table that only ever grows is the classic missing-TTL leak)."""
    if not rows:
        return {"n_batches": 0, "total_input_rows": 0,
                "max_batch_duration_ms": 0, "p50_batch_duration_ms": 0,
                "state_rows_first": 0, "state_rows_last": 0,
                "state_growth": 0}
    durs = sorted(r["batch_duration_ms"] for r in rows)
    by_batch = sorted(rows, key=lambda r: r["batch_id"])
    return {
        "n_batches": len(rows),
        "total_input_rows": sum(r["num_input_rows"] for r in rows),
        "max_batch_duration_ms": durs[-1],
        "p50_batch_duration_ms": durs[len(durs) // 2],
        "state_rows_first": by_batch[0]["state_rows_total"],
        "state_rows_last": by_batch[-1]["state_rows_total"],
        "state_growth": (by_batch[-1]["state_rows_total"]
                         - by_batch[0]["state_rows_total"]),
    }


def lag_alerts(rows: list[dict], max_batch_ms: int) -> list[dict]:
    """Batches whose duration exceeded the budget — the falling-behind
    signal when the budget is the trigger interval."""
    return [{"batch_id": r["batch_id"],
             "batch_duration_ms": r["batch_duration_ms"]}
            for r in sorted(rows, key=lambda r: r["batch_id"])
            if r["batch_duration_ms"] > max_batch_ms]
