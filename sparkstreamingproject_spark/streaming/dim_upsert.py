"""E3: last-write-wins dimension upsert (``OdsBaseDbApp.scala:139-166``).

The reference point-SETs each dim row into Redis and relies on Kafka
per-key ordering for last-write-wins. Here the dim store is a parquet
table and the upsert is an explicit MERGE-shaped batch op:

1. dedup incoming batch to the newest row per key (row_number over
   version desc — deterministic under any parallelism);
2. union with the existing table and keep the newest per key again;
3. atomically swap the table directory.

On a table format with real MERGE (Delta/Iceberg) steps 2-3 collapse
into ``MERGE INTO``; the parquet swap keeps this container-friendly.
Dimension tables are small relative to facts (that's why they broadcast)
so the rewrite cost is bounded.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(df: DataFrame, key_cols: list[str], version_col: str) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def upsert_dim_parquet(updates: DataFrame, table_dir: str,
                       key_cols: list[str], version_col: str) -> None:
    spark = updates.sparkSession
    incoming = latest_per_key(updates, key_cols, version_col)
    if os.path.isdir(table_dir) and any(
            f.endswith(".parquet") for f in os.listdir(table_dir)):
        base = spark.read.parquet(table_dir)
        merged = latest_per_key(base.unionByName(incoming), key_cols, version_col)
    else:
        merged = incoming
    tmp = f"{table_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(table_dir):
        shutil.rmtree(table_dir)
    os.rename(tmp, table_dir)


def read_dim(spark, table_dir: str) -> DataFrame:
    return spark.read.parquet(table_dir)
