"""The log-splitter application (≙ ``OdsBaseLogApp.scala:22-212``).

Pipeline: source (file landing zone or Kafka) → JSON parse into the
declared envelope → 5-way split → per-topic parquet tables (or Kafka
topics). Offset bookkeeping, flush ordering, and replay — ~140 lines of
the reference — are the checkpoint.

Usage:
    python -m sparkstreamingproject_spark.apps.ods_base_log \
        --source /data/landing --out /data/dwd --checkpoint /data/ck \
        [--trigger-seconds 5 | --once] [--kafka host:9092 --topic ODS_BASE_LOG]
"""

from __future__ import annotations

import argparse

from ..operators.flatten import parse_log_envelope
from ..schemas import LOG_ENVELOPE_SCHEMA
from ..session import get_spark
from ..sources.kafka import kafka_source, kafka_value_as_string
from ..sources.streams import file_stream
from ..streaming.split import split_log_stream_to_sinks


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", help="landing-zone dir of envelope parquet/json")
    p.add_argument("--source-format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--trigger-seconds", type=int, default=5)
    p.add_argument("--once", action="store_true",
                   help="drain available input and stop (backfill mode)")
    p.add_argument("--kafka", help="bootstrap servers (use Kafka source)")
    p.add_argument("--topic", default="ODS_BASE_LOG")
    return p


def run(args, spark=None):
    spark = spark or get_spark("ods-base-log")
    if args.kafka:
        raw = kafka_value_as_string(kafka_source(spark, args.kafka, args.topic))
        env = parse_log_envelope(raw)
    elif args.source_format == "json":
        stream = (spark.readStream.schema("value string").text(args.source)
                  .withColumnRenamed("value", "value"))
        env = parse_log_envelope(stream)
    else:
        # envelope already typed in the landing zone
        env = file_stream(spark, args.source, LOG_ENVELOPE_SCHEMA)
    trigger = None if args.once else args.trigger_seconds
    return split_log_stream_to_sinks(env, args.out, args.checkpoint, trigger)


def main(argv=None):
    args = build_parser().parse_args(argv)
    q = run(args)
    q.awaitTermination()


if __name__ == "__main__":
    main()
