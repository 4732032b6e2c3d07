"""Arbitrary stateful streaming on Spark 4's transformWithState API
(`StatefulProcessor` + typed state handles) — the successor surface to
``applyInPandasWithState`` (streaming/stateful.py keeps the classic
form; both are part of the engine's custom-stateful-operator story).

transformWithState requires the RocksDB state store provider
(``use_rocksdb_state``) — which is also the right provider at scale:
state lives off-heap/on-disk per partition instead of in executor
heap, so per-key state count is bounded by disk, not memory.

ENVIRONMENT NOTE: the transformWithState Python worker speaks protobuf
to the JVM state server (`pyspark/sql/streaming/proto/`), so it needs
the ``protobuf`` package at runtime. This container does not ship it
(and installs are not possible), so the accompanying test
(tests/test_stateful2.py) skips itself when ``google.protobuf`` is
absent; on any standard Spark 4 cluster image (protobuf is a pyspark
[connect]/[sql] extra) it runs. The classic applyInPandasWithState
operators (streaming/stateful.py) carry the custom-stateful coverage
in this sandbox.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


def use_rocksdb_state(spark) -> None:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)


class RunningSpend(StatefulProcessor):
    """Per-user running (total value, event count): one ValueState row
    per key, updated per micro-batch, emitted in Update mode — the
    minimal lifetime-value accumulator. State is two scalars per user:
    at 1B users that is GBs spread across RocksDB instances, not heap.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "agg", "total double, n bigint")

    def handleInputRows(self, key, rows, timerValues
                        ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            total, n = self._state.get()
        else:
            total, n = 0.0, 0
        for pdf in rows:
            total += float(pdf["value"].sum())
            n += len(pdf)
        self._state.update((total, n))
        yield pd.DataFrame({"user_id": [key[0]],
                            "total": [round(total, 2)], "n": [n]})

    def close(self) -> None:
        pass


def running_spend_stream(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → per-key running totals.
    Output mode Update: each micro-batch emits the keys it touched."""
    use_rocksdb_state(events.sparkSession)
    return (events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningSpend(),
        outputStructType="user_id bigint, total double, n bigint",
        outputMode="Update",
        timeMode="None",
    ))
