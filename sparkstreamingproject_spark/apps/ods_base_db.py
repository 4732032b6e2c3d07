"""The CDC fact/dim router application (≙ ``OdsBaseDbApp.scala:29-182``).

Pipeline: Maxwell CDC source → op mapping (I/U, drop others) → fact
rows to dynamic ``{TABLE}_{op}`` topics (topic-partitioned sink), dim
rows merged last-write-wins into per-table dimension stores. Routing
config is re-read every batch (the reference's per-batch Redis
``smembers`` — ``OdsBaseDbApp.scala:89-94`` — as a JSON file).

Usage:
    python -m sparkstreamingproject_spark.apps.ods_base_db \
        --source /data/cdc --out /data/routed --checkpoint /data/ck \
        --routing-config routing.json [--once]
"""

from __future__ import annotations

import argparse

from ..operators.flatten import parse_cdc_envelope
from ..schemas import CDC_ENVELOPE_SCHEMA
from ..session import get_spark
from ..sources.kafka import kafka_source, kafka_value_as_string
from ..sources.streams import file_stream
from ..streaming.cdc_router import route_cdc_stream


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", help="landing-zone dir of CDC parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--routing-config", required=True,
                   help='JSON: {"fact_tables": [...], "dim_tables": [...]}')
    p.add_argument("--trigger-seconds", type=int, default=5)
    p.add_argument("--once", action="store_true")
    p.add_argument("--kafka")
    p.add_argument("--topic", default="ODS_BASE_DB")
    return p


def run(args, spark=None):
    spark = spark or get_spark("ods-base-db")
    if args.kafka:
        raw = kafka_value_as_string(kafka_source(spark, args.kafka, args.topic))
        cdc = parse_cdc_envelope(raw)
    else:
        cdc = file_stream(spark, args.source, CDC_ENVELOPE_SCHEMA)
    trigger = None if args.once else args.trigger_seconds
    return route_cdc_stream(cdc, args.out, args.checkpoint,
                            args.routing_config, trigger)


def main(argv=None):
    args = build_parser().parse_args(argv)
    q = run(args)
    q.awaitTermination()


if __name__ == "__main__":
    main()
