"""JDBC source/sink builders (SURVEY.md §2.I — the reference declares
mysql-connector 5.1.47 as Maxwell's upstream; the engine exposes the
equivalent direct-JDBC capability).

No database exists in the test container, so these are builders with
the scale-correct defaults documented; they execute against any JDBC
URL in deployment.

The single thing that matters at scale: NEVER read a big table through
the single-connection default. ``partitioned_jdbc_read`` splits the
read into ``num_partitions`` range-predicated queries — parallel
ingest, one connection per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def partitioned_jdbc_read(spark: SparkSession, url: str, table: str,
                          partition_column: str, lower: int, upper: int,
                          num_partitions: int = 32,
                          properties: dict | None = None) -> DataFrame:
    """Range-partitioned parallel JDBC read. ``partition_column`` must
    be an indexed numeric column; bounds outside the true min/max only
    skew the first/last partition, they never drop rows."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("partitionColumn", partition_column)
              .option("lowerBound", str(lower))
              .option("upperBound", str(upper))
              .option("numPartitions", str(num_partitions))
              .option("fetchsize", "10000"))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write(df: DataFrame, url: str, table: str, mode: str = "append",
               batch_size: int = 10000, properties: dict | None = None) -> None:
    """Batched JDBC write (one connection per partition — repartition
    the DataFrame to control write concurrency vs the DB's limits)."""
    writer = (df.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batch_size))
              .mode(mode))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
