"""Write-side helpers: partitioned/bucketed layout and small-file
compaction.

Layout IS performance at 100 TB:
- partition by the dominant filter column (date, topic) → partition
  pruning turns full scans into directory lookups;
- bucket by the dominant join key → co-located sort-merge joins with
  no Exchange (verified in tests/test_scale_patterns.py);
- compact streaming sink output — a 5-second trigger writing 32
  partitions produces ~550k files/day; scans die on file-open overhead
  long before data volume matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "append") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         n_buckets: int = 32, sort: bool = True,
                         mode: str = "overwrite") -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: int = 128) -> int:
    """Rewrite a parquet directory into ~target-sized files. Returns the
    new file count. Atomic via write-to-temp + rename (same pattern as
    the dim upsert). On a table format (Delta/Iceberg) use OPTIMIZE."""
    import shutil
    import uuid

    df = spark.read.parquet(path)
    size_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))
    n_files = max(1, size_bytes // (target_file_mb * 1024 * 1024) + 1)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(1 for dp, _, fs in os.walk(path)
               for f in fs if f.endswith(".parquet"))
