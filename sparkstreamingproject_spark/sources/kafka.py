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


#: columns the Kafka sink accepts — anything else is an analysis error
#: at stream start (key/partition/headers optional, value required,
#: topic required iff no static topic option is set)
KAFKA_SINK_COLUMNS = frozenset(
    {"key", "value", "topic", "partition", "headers"})


def offsets_json(starting_offsets: str | dict) -> str:
    """A2 wire format: "latest"/"earliest" pass through; a
    ``{topic: {partition: offset}}`` dict serializes to the
    ``startingOffsets`` JSON the Kafka source expects (string partition
    keys, integer offsets — ``MyOffsetUtils.scala:64-83`` builds the
    same map from its Redis ledger)."""
    if isinstance(starting_offsets, dict):
        return json.dumps(
            {t: {str(p): int(o) for p, o in parts.items()}
             for t, parts in starting_offsets.items()})
    return starting_offsets


def validate_kafka_payload(df: DataFrame, topic: str | None = None) -> None:
    """E4 wire contract, checked eagerly (instead of failing at stream
    start): ``value`` column present as string/binary; every column
    drawn from the sink's accepted set; and a ``topic`` string column
    present when no static topic is configured (op E2's dynamic
    routing). Raises ``ValueError`` with the violation."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    extra = set(fields) - KAFKA_SINK_COLUMNS
    if extra:
        raise ValueError(
            f"kafka sink accepts only {sorted(KAFKA_SINK_COLUMNS)}; "
            f"unexpected columns: {sorted(extra)}")
    if "value" not in fields:
        raise ValueError("kafka sink requires a 'value' column")
    if fields["value"] not in ("string", "binary"):
        raise ValueError(
            f"'value' must be string or binary, got {fields['value']}")
    if topic is None:
        if "topic" not in fields:
            raise ValueError(
                "no static topic configured: the DataFrame must carry a "
                "'topic' column (dynamic routing, OdsBaseDbApp.scala:123-129)")
        if fields["topic"] != "string":
            raise ValueError(
                f"'topic' must be string, got {fields['topic']}")


def kafka_source(spark: SparkSession, bootstrap_servers: str, topics: str,
                 starting_offsets: str | dict = "latest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """A1/A2: subscribe-mode Kafka stream.

    ``starting_offsets`` may be "latest"/"earliest" or a per-partition
    dict ``{topic: {partition: offset}}`` (the A2 resume pattern).
    """
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topics)
              .option("startingOffsets", offsets_json(starting_offsets)))
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

    The payload contract is validated eagerly (``validate_kafka_payload``)
    so a malformed projection fails at build time with a clear message,
    not at stream start.
    """
    validate_kafka_payload(df, topic)
    writer = (df.writeStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("checkpointLocation", checkpoint)
              .trigger(processingTime=f"{trigger_seconds} seconds"))
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
