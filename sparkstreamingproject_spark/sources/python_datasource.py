"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference wraps its input system in a hand-rolled source layer
(`MyKafkaUtils.scala:44-111`: subscribe, explicit offsets, per-batch
offset capture). This module is that idea rebuilt on the engine's OWN
extension point: a registered `synthetic_events` source that serves a
deterministic events-shaped table

- as a **batch** relation split into N `InputPartition`s (each
  partition generates its own rows from (seed, partition_id) — no
  driver materialization, no shared RNG state), and
- as a **micro-batch stream** whose offsets are plain row positions:
  `initialOffset → latestOffset` advance by `rowsPerBatch` up to
  `maxRows`, `partitions(start, end)` carves the range, and restart
  resumes from the checkpointed offset exactly like a Kafka topic —
  the §2.A subscribe/from-offsets semantics with the offset ledger
  managed by Structured Streaming instead of Redis
  (`MyOffsetUtils.scala:38-70`).

Rows are generated with splitmix64-style integer mixing so any
(partition, row) pair is O(1)-addressable and identical on every
executor, every run — the property the oracle-style tests assert.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
          "event_type string, value double")
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic int→int hash."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(seed: int, i: int):
    import datetime
    h = _mix(seed * 0x100000001B3 + i)
    us = BASE_US + i * 60_000_000 + h % 1_000_000
    return (
        i,
        datetime.datetime.utcfromtimestamp(us / 1e6),
        h % 1000,
        EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)],
        round((h >> 13) % 10_000 / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, -(-self.rows // self.num_partitions))
        return [_RangePartition(self.seed, s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.max_rows = int(options.get("maxRows", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.num_partitions = int(options.get("partitions", 4))
        self.chunked = str(options.get("chunked", "false")).lower() == "true"

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # Two modes. Default (chunked=false): report max_rows — "all
        # available" for this finite topic, which is what
        # Trigger.AvailableNow requires (the engine snapshots ONE
        # latestOffset() call as the drain limit; a moving answer would
        # leave the drain short). chunked=true: advance one
        # rows_per_batch step per call, so a RUNNING trigger (which
        # calls latestOffset once per micro-batch) sees the topic
        # arrive in chunks across many micro-batches — the
        # Kafka-backlog shape the streaming-topology tests need.
        if not self.chunked:
            return {"pos": self.max_rows}
        self._pos = min(max(getattr(self, "_pos", 0),
                            getattr(self, "_served", 0))
                        + self.rows_per_batch,
                        self.max_rows)
        return {"pos": self._pos}

    def partitions(self, start, end):
        # Restart safety for chunked mode: a fresh reader's first
        # latestOffset() can be BELOW the checkpointed offset, and the
        # engine compares offsets as opaque JSON — it would plan a
        # "backward" batch and then re-serve already-committed rows.
        # Clamp the range to the high-water mark of everything this
        # instance has been asked for, so no row is ever served twice
        # (legitimate replay of an uncommitted batch is unaffected — a
        # fresh instance starts with high-water 0).
        s, e = start["pos"], end["pos"]
        hw = getattr(self, "_served", 0)
        s = max(s, hw)
        self._served = max(hw, s, e)
        if e <= s:
            return [_RangePartition(self.seed, s, s)]
        step = max(1, -(-(e - s) // self.num_partitions))
        return [_RangePartition(self.seed, p, min(p + step, e))
                for p in range(s, e, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    """`spark.dataSource.register(SyntheticEventsDataSource)` then
    `spark.read.format("synthetic_events").option(...)` /
    `spark.readStream.format("synthetic_events")`."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
