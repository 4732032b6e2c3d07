"""Streaming sources (SURVEY.md §2.A).

The reference consumes Kafka via the DStream direct API with manual
offset management in Redis (``MyKafkaUtils.scala:44-69``,
``MyOffsetUtils.scala:38-83``). Structured Streaming subsumes all of it:
the commit log under ``checkpointLocation`` tracks offsets with
exactly-once state semantics, so ops A1/A2/F1/F2 reduce to reader
options.

No Kafka broker exists in the test environment; ``kafka.py`` builds the
(real) reader/writer plans, and tests exercise the same topology with
file streams — identical DataFrame surface, swappable source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "parquet", max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming file source — the test stand-in for a Kafka topic and a
    production pattern in its own right (landing-zone ingestion)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second)).load())
