"""Kafka source/sink builders (SURVEY.md §2.A ops A1/A2, §2.E op E4).

Replaces the reference's hand-rolled consumer/producer utilities
(``MyKafkaUtils.scala:22-121``): subscribe-mode direct stream with
``latest`` reset (A1, ``MyKafkaUtils.scala:44-54``), resume-from-stored-
offsets (A2, ``MyKafkaUtils.scala:59-69`` + ``MyOffsetUtils.scala:64-83``),
and a singleton flushing producer (E4, ``MyKafkaUtils.scala:76-119``).

In Structured Streaming, A2's manual offset store is obsolete — the
checkpoint commit log resumes exactly where the last batch committed,
with the sink-before-commit ordering the reference implements by hand
(flush at ``OdsBaseLogApp.scala:194`` before offset save at ``:205``)
guaranteed by the engine. ``starting_offsets`` is still exposed for
replay/backfill use.

These builders produce real plans but need a broker to execute; the
test suite exercises identical topologies over file streams.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(spark: SparkSession, bootstrap_servers: str, topics: str,
                 starting_offsets: str | dict = "latest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """A1/A2: subscribe-mode Kafka stream.

    ``starting_offsets`` may be "latest"/"earliest" or a per-partition
    dict ``{topic: {partition: offset}}`` (the A2 resume pattern).
    """
    if isinstance(starting_offsets, dict):
        starting_offsets = json.dumps(starting_offsets)
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topics)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_value_as_string(df: DataFrame) -> DataFrame:
    """The reference treats every record as a JSON string value
    (``OdsBaseLogApp.scala:57-64``)."""
    return df.select(F.col("value").cast("string").alias("value"),
                     "topic", "partition", "offset", "timestamp")


def kafka_sink(df: DataFrame, bootstrap_servers: str, checkpoint: str,
               topic: str | None = None, trigger_seconds: int = 5):
    """E4: Kafka sink. If ``topic`` is None the DataFrame must carry a
    ``topic`` column — that is op E2 (data-dependent routing,
    ``OdsBaseDbApp.scala:123-129``) expressed natively by the sink.
    Producer pooling/flush/acks are engine-managed (vs the hand-rolled
    singleton + flush at ``MyKafkaUtils.scala:103,117-119``).
    """
    writer = (df.writeStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("checkpointLocation", checkpoint)
              .trigger(processingTime=f"{trigger_seconds} seconds"))
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
