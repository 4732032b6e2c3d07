"""Query-registry plumbing.

A query is a callable ``(spark, sf_dir) -> DataFrame`` plus (usually) a
DuckDB-runnable ANSI-SQL oracle string over the same parquet tables.
Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing.

Float discipline: any *derived* float (sum/avg/product chains) is
rounded identically on both sides (2dp for money, 4-6dp for ratios) so
summation-order last-bit drift can't flip the value hash. Raw stored
doubles pass through unrounded (bit-identical in both engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn
    return deco


class _Queries(dict):
    def __missing__(self, k):  # pragma: no cover
        raise KeyError(k)


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in REGISTRY.items()}


def ORACLES() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


_TUNED_SESSIONS: set[int] = set()


def _tune(spark: SparkSession) -> None:
    """Apply runtime-settable engine confs to an externally-built
    session (the verify driver constructs its own SparkSession with
    library defaults — 200 shuffle partitions, AQE per version default).
    Idempotent per session."""
    key = id(spark)
    if key in _TUNED_SESSIONS:
        return
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    import os
    spark.conf.set("spark.sql.shuffle.partitions",
                   os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _TUNED_SESSIONS.add(key)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as int64 nanos and floor-divide to micros — the
        # same truncation DuckDB applies reading the file, so event-time
        # values agree across engines.
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Timezone discipline (learned the hard way — verified under
# TZ=America/New_York):
#
# - PySpark's non-Arrow collect() renders TimestampType in the MACHINE
#   timezone (datetime.fromtimestamp), while parquet wall-clock values
#   round-trip correctly only when session tz == machine tz (the
#   default). So: NEVER mutate spark.sql.session.timeZone — it desyncs
#   interpretation from rendering and corrupts every later timestamp
#   query on a non-UTC machine.
# - orders/lineitem timestamps are naive wall times: pass them through
#   untouched (they round-trip at any machine tz).
# - events.ts is a true UTC instant (from int64 nanos): never output it
#   or any wall-clock derivation of it; derive epoch-integer buckets
#   (unix_micros arithmetic) instead, and compare against DuckDB
#   epoch()/epoch_us() which treat the naive value as UTC.
