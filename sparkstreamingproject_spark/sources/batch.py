"""Batch sources (SURVEY.md §2.A, op A3).

Parquet is the primary storage format (plays the role the reference
gives Kafka topics + Redis/HBase tables). Scans are declarative so
Catalyst applies predicate pushdown, column pruning, and partition
pruning — at 100 TB the difference between scanning 3 columns of one
date partition and scanning everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import TABLES


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json_lines(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with a declared schema (never schema inference — an
    extra full pass at scale)."""
    return spark.read.schema(schema).json(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True) -> DataFrame:
    """CSV with a declared schema (inference = an extra full pass at
    scale, and nondeterministic typing on dirty data)."""
    return (spark.read.schema(schema)
            .option("header", str(header).lower()).csv(path))


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (df.write.mode("overwrite")
     .option("header", str(header).lower()).csv(path))


def write_json_lines(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — same pushdown/pruning properties as parquet (both are
    columnar with file/stripe statistics); offered for interop with
    Hive-era warehouses where ORC is the incumbent format."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of all files under
    ``path`` (columns added by later writers surface as nulls in older
    rows). mergeSchema costs a footer pass per file — enable it per
    read, not globally."""
    return spark.read.option("mergeSchema", "true").parquet(path)
