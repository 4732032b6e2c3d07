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
        # a name collision silently served a different implementation
        # under an already-driver-certified name once (see COVERAGE.md
        # wave-7/15 correction) — make it an import error forever
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} already "
                f"registered by {REGISTRY[name].fn.__module__}")
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
        # Normalize events.ts to a TIMESTAMP (UTC-instant) column whose
        # unix_micros equals the stored microsecond value, regardless of
        # machine/session timezone — every downstream event-time query
        # does unix_micros arithmetic against DuckDB's epoch_us(), which
        # treats the stored naive value as UTC. The file has shipped in
        # two physical forms across driver testdata generations:
        #   - TIMESTAMP(NANOS): Spark refuses it without the
        #     nanosAsLong legacy flag; read as int64 nanos, floor to µs.
        #   - TIMESTAMP(MICROS, NTZ): reads as TIMESTAMP_NTZ; convert
        #     via wall-clock-only timestampdiff from the NTZ epoch (no
        #     session-tz cast — that would shift values off UTC).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            us = F.expr("timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
            return df.withColumn("ts", F.timestamp_micros(us))
        return df
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
