"""Relational core operators (SURVEY.md §2.I — the implied surface).

The reference stores dim rows in Redis precisely so a downstream app can
enrich fact streams by point lookup (``OdsBaseDbApp.scala:139-154``).
The Spark-native form is a join — broadcast hash join for small dims
(ships the dim once per executor, no shuffle of the 100 TB fact side),
sort-merge for large-large (AQE converts to broadcast at runtime when a
side turns out small, and splits skewed partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(fact: DataFrame, dim: DataFrame, on, how: str = "left",
                    broadcast_dim: bool = True) -> DataFrame:
    """The DIM:* lookup pattern as a broadcast join. ``broadcast_dim``
    should stay True for anything that fits in executor memory
    (dimension tables at 100 TB fact scale are still MBs–GBs)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — returns left rows with a match, never duplicates left."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — left rows without a match (the delete/orphan idiom)."""
    return left.join(right, on=on, how="left_anti")


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: salt the skewed (left) side's key with
    a random bucket, replicate the right side across all buckets, join
    on (key, salt). A hot key that would land on one reducer spreads
    over ``salt_buckets`` of them.

    AQE's skew-join splitting handles most cases automatically; explicit
    salting remains for the pathological single-key hot spot (e.g. the
    null/default key) where even a split partition is one key. Columns
    returned = left ∪ right (salt dropped).
    """
    salt = (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets)
    lsalted = left.withColumn("_salt", salt)
    rrep = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = lsalted.join(rrep, [key, "_salt"], how)
    return out.drop("_salt")


def dedup_last_per_key(df: DataFrame, key_cols: list[str], version_col: str) -> DataFrame:
    """Keep the newest row per key — used by dim upsert (E3) and CDC
    compaction. Explicit version ordering, not arrival order."""
    from pyspark.sql import Window
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
