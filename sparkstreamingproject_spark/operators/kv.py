"""Keyed-table operators — the KV-store surface (SURVEY.md §2.G).

The reference's HBase/Redis point-access idioms (``HbaseDML.java:98-162``,
``Jedis_Pool.java:62-98``) become predicates/joins/merges on keyed
DataFrames. At scale these rely on pushdown (point/range predicates
reach the parquet scan and prune row groups) rather than an external
KV service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kv_get(df: DataFrame, key_col: str, key) -> DataFrame:
    """G1 point lookup (``HbaseDML.java:98-113``). Pushes an equality
    predicate into the scan."""
    return df.filter(F.col(key_col) == F.lit(key))


def kv_multi_get(df: DataFrame, key_col: str, keys: list) -> DataFrame:
    """G7 batched get (``Jedis_Pool.java:62-68``) — IN-list predicate."""
    return df.filter(F.col(key_col).isin(*keys))


def kv_range_scan(df: DataFrame, key_col: str, start, stop) -> DataFrame:
    """G3 ordered range scan ``[start, stop)`` (``HbaseDML.java:127-149``).
    Range predicate pushes down; ordering is explicit (Spark tables are
    not key-sorted unless bucketed/sorted on write)."""
    return (df.filter((F.col(key_col) >= F.lit(start)) & (F.col(key_col) < F.lit(stop)))
            .orderBy(key_col))


def kv_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str],
              version_col: str) -> DataFrame:
    """G2/E3 last-write-wins upsert as a deterministic DataFrame op:
    union then keep the highest-version row per key. The reference gets
    last-write-wins implicitly from Kafka per-key partition ordering
    (``OdsBaseDbApp.scala:160-164``); here it is explicit via
    ``row_number`` over version desc — deterministic under any
    parallelism.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (base.unionByName(updates)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def kv_delete(df: DataFrame, key_col: str, key) -> DataFrame:
    """G4 delete-by-key (``HbaseDML.java:152-162``) — anti-predicate
    (on a table format with DML, this is ``DELETE WHERE``)."""
    return df.filter(F.col(key_col) != F.lit(key))


def topk_by_score(df: DataFrame, partition_cols: list[str], score_col: str,
                  k: int, tiebreak_cols: list[str] | None = None) -> DataFrame:
    """G10 zset analog (``Jedis_Pool.java:93-98``): top-k per group by
    score. ``row_number`` with explicit tiebreaks for determinism. The
    per-group sort is partial (window over groups), never a global sort.
    """
    order = [F.col(score_col).desc()] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kv_expire_sweep(df: DataFrame, key_cols: list[str], ts_col: str,
                    ttl_seconds: int, now_df: DataFrame) -> DataFrame:
    """G11 Redis EXPIRE/TTL semantics (``Jedis_Pool.java`` deployments
    pair every SETEX with a TTL; the reference's dim cache relies on
    it for eviction): the TTL applies to the KEY and every write
    resets it, so liveness is decided by the LATEST write per key —
    an expired key is gone even if older writes would still be in
    range. ``now_df`` is a one-row frame with a ``now`` timestamp
    column (pass the max event time for a deterministic sweep, or a
    literal clock). Returns one row per key with its last-write time
    and a ``live`` flag; filter on it for the live view, aggregate it
    for an eviction report. The per-key argmax is a partial aggregate
    (max over key groups, map-side combinable), never a sort; the
    clock is a broadcast scalar."""
    last = (df.groupBy(*key_cols)
            .agg(F.max(F.col(ts_col)).alias("last_write")))
    return (last.crossJoin(F.broadcast(now_df))
            .withColumn(
                "live",
                F.unix_micros(F.col("last_write"))
                + ttl_seconds * 1_000_000
                > F.unix_micros(F.col("now")))
            .drop("now"))
