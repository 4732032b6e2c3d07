"""Kafka-shaped wire contract, driven end-to-end WITHOUT a broker.

The container has no Kafka, so the transport itself can't run — but
everything around the transport can: offset-based micro-batch
semantics, the record-value JSON round-trip, the dynamic topic-column
sink contract, and checkpoint resume. The custom ``synthetic_events``
streaming source (sources/python_datasource.py) plays the broker: its
offsets are row positions advanced per micro-batch exactly like a
topic's, and ``chunked=true`` makes the backlog arrive across MANY
micro-batches instead of one availableNow drain.

Reference behavior being reproduced: ``MyKafkaUtils.scala:44-111``
(subscribe + explicit offsets + producer), ``OdsBaseLogApp.scala:57-64``
(value-as-JSON-string parse), ``OdsBaseDbApp.scala:123-129`` (dynamic
``upper(table)_op`` topic routing).
"""

from __future__ import annotations

import json
import time

import pytest

pytestmark = pytest.mark.smoke  # ~5-min preflight tier (COVERAGE.md)
from pyspark.sql import functions as F

from sparkstreamingproject_spark.schemas import (
    CDC_ENVELOPE_SCHEMA, LOG_ENVELOPE_SCHEMA,
)
from sparkstreamingproject_spark.sources.kafka import (
    kafka_sink, offsets_json, validate_kafka_payload,
)
from sparkstreamingproject_spark.sources.python_datasource import register
from sparkstreamingproject_spark.streaming.cdc_router import (
    fact_topic_payload, route_cdc_stream,
)
from sparkstreamingproject_spark.streaming.split import (
    split_log_stream_to_sinks,
)
from sparkstreamingproject_spark.operators.flatten import (
    error_log, page_log, start_log,
)
from sparkstreamingproject_spark.operators.routing import (
    TOPIC_ERROR, TOPIC_PAGE, TOPIC_START,
)

from .fixtures import cdc_df


def _synthetic_stream(spark, max_rows, chunked=True, rows_per_batch=50,
                      partitions=3):
    register(spark)
    return (spark.readStream.format("synthetic_events")
            .option("maxRows", max_rows)
            .option("rowsPerBatch", rows_per_batch)
            .option("partitions", partitions)
            .option("chunked", str(chunked).lower())
            .load())


def _await_rows(spark, path, want, timeout_s=120):
    deadline = time.time() + timeout_s
    last = -1
    while time.time() < deadline:
        try:
            last = spark.read.parquet(path).count()
        except Exception:
            last = -1
        if last >= want:
            return last
        time.sleep(0.5)
    raise AssertionError(f"timed out waiting for {want} rows, saw {last}")


@pytest.mark.slow
def test_chunked_source_yields_many_microbatches_and_resumes(spark, tmp_path):
    """A1/A2 offset semantics on a running trigger: the backlog drains
    in rows_per_batch chunks (one latestOffset() step per micro-batch),
    and a restart resumes from the checkpointed offset — the Redis
    offset ledger (MyOffsetUtils.scala:38-70) played by the engine's
    commit log, with zero duplicates."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run(max_rows):
        q = (_synthetic_stream(spark, max_rows)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(processingTime="0 seconds").start())
        try:
            _await_rows(spark, out, max_rows)
        finally:
            q.stop()
            q.awaitTermination(60)
        return q

    q1 = run(150)
    # >1 data-carrying micro-batch proves chunked admission (a single
    # availableNow drain would be exactly one)
    data_batches = [p for p in q1.recentProgress
                    if p["numInputRows"] and p["numInputRows"] > 0]
    assert len(data_batches) >= 3, (
        f"expected >=3 chunked micro-batches, saw "
        f"{[p['numInputRows'] for p in q1.recentProgress]}")
    assert max(p["numInputRows"] for p in data_batches) <= 50

    run(300)  # restart: resumes at offset 150, drains the new backlog
    final = spark.read.parquet(out)
    assert final.count() == 300
    assert final.select("event_id").distinct().count() == 300


@pytest.mark.slow
def test_wire_value_roundtrip_through_split_topology(spark, tmp_path):
    """The full Kafka record path minus the socket: rows serialize to a
    JSON ``value`` string (what the broker would carry), the consumer
    side parses value-as-string with the envelope schema
    (OdsBaseLogApp.scala:57-64) and runs the 5-way split — stream
    results equal the batch computation over the same generator."""
    out, ck = str(tmp_path / "wout"), str(tmp_path / "wck")
    n = 120

    def to_envelope_value(df):
        # event rows → log-envelope JSON on the wire
        return df.select(F.to_json(F.struct(
            F.struct(
                F.concat(F.lit("mid_"), F.col("event_id")).alias("mid"),
                F.col("user_id").cast("string").alias("uid"),
            ).alias("common"),
            F.when(F.col("event_type").isin("view", "click", "purchase"),
                   F.struct(F.col("event_type").alias("page_id"))
                   ).alias("page"),
            F.when(F.col("event_type") == "signup",
                   F.struct(F.lit("icon").alias("entry"))).alias("start"),
            F.when(F.col("event_type") == "error",
                   F.lit('{"error_code":3}')).alias("err"),
            F.col("event_id").alias("ts"),
        )).alias("value"))

    def parse(wire):
        # the consumer's first two ops: value cast to string, JSON parse
        return (wire.select(F.col("value").cast("string").alias("value"))
                .select(F.from_json("value", LOG_ENVELOPE_SCHEMA).alias("e"))
                .select("e.*"))

    stream = parse(to_envelope_value(_synthetic_stream(spark, n)))
    q = split_log_stream_to_sinks(stream, out, ck, trigger_seconds=0)
    try:
        _await_rows(spark, f"{out}/{TOPIC_PAGE}", 1)
        deadline = time.time() + 120
        while time.time() < deadline:
            done = sum(p["numInputRows"] for p in q.recentProgress
                       if p["numInputRows"])
            if done >= n:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)

    batch_env = parse(to_envelope_value(
        spark.read.format("synthetic_events").option("rows", str(n)).load()))
    for topic, op in ((TOPIC_ERROR, error_log), (TOPIC_PAGE, page_log),
                      (TOPIC_START, start_log)):
        want = op(batch_env).count()
        got = spark.read.parquet(f"{out}/{topic}").count()
        assert got == want, f"{topic}: stream={got} batch={want}"
        assert want > 0, f"generator produced no {topic} records"


@pytest.mark.slow
def test_cdc_wire_roundtrip_dynamic_topic_routing(spark, tmp_path):
    """E2/E3 over the wire shape: CDC rows serialize to Maxwell-style
    JSON values, the router parses and fans facts out by the dynamic
    ``upper(table)_op`` topic while dims upsert — and the fact relation
    is byte-for-byte the payload the Kafka sink would consume."""
    out, ck = str(tmp_path / "cout"), str(tmp_path / "cck")
    land = str(tmp_path / "cdc_land")
    cfg = tmp_path / "routing.json"
    cfg.write_text(json.dumps({"fact_tables": ["order_info", "order_detail"],
                               "dim_tables": ["user_info", "base_province"]}))

    rows = cdc_df(spark, n=80)
    rows.select(F.to_json(F.struct(*rows.columns)).alias("value")) \
        .coalesce(1).write.mode("overwrite").parquet(land)

    wire = (spark.readStream.schema("value string").parquet(land)
            .select(F.from_json("value", CDC_ENVELOPE_SCHEMA).alias("e"))
            .select("e.*"))
    q = route_cdc_stream(wire, out, ck, str(cfg), trigger_seconds=None)
    q.awaitTermination(120)

    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_dim, read_cdc_facts)

    facts = read_cdc_facts(spark, out)
    topics = {r["topic"] for r in facts.select("topic").distinct().collect()}
    assert topics, "no fact topics routed"
    # dynamic topic = upper(table) + "_" + optype (I/U/D single-letter
    # codes, case_when_map_optype — OdsBaseDbApp.scala:113-121)
    assert all(t.rsplit("_", 1)[-1] in {"I", "U", "D"}
               and t.rsplit("_", 1)[0] == t.rsplit("_", 1)[0].upper()
               for t in topics), topics
    expected = fact_topic_payload(cdc_df(spark, n=80),
                                  ["order_info", "order_detail"])
    got = facts.select("topic", "value")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # dims upserted last-write-wins
    dim = read_cdc_dim(spark, out, "user_info")
    assert dim.count() == dim.select("id").distinct().count()


def test_fact_payload_satisfies_kafka_sink_contract(spark):
    """The dynamic-topic relation passes the sink validator as-is."""
    payload = fact_topic_payload(cdc_df(spark, n=40), ["order_info"])
    validate_kafka_payload(payload, topic=None)  # must not raise
    assert dict(payload.dtypes) == {"topic": "string", "value": "string"}


def test_kafka_sink_rejects_malformed_payloads(spark):
    payload = fact_topic_payload(cdc_df(spark, n=10), ["order_info"])
    with pytest.raises(ValueError, match="'value' column"):
        kafka_sink(payload.select("topic"), "b:9092", "/tmp/ck")
    with pytest.raises(ValueError, match="'topic' column"):
        kafka_sink(payload.select("value"), "b:9092", "/tmp/ck")
    with pytest.raises(ValueError, match="unexpected columns"):
        kafka_sink(payload.withColumn("extra", F.lit(1)), "b:9092", "/tmp/ck")
    with pytest.raises(ValueError, match="string or binary"):
        validate_kafka_payload(
            payload.withColumn("value", F.lit(1)), topic=None)
    # static topic configured → no topic column required
    validate_kafka_payload(payload.select("value"), topic="fixed")


def test_kafka_sink_builds_with_dynamic_topic_stream(spark, tmp_path):
    """kafka_sink accepts a streaming topic+value relation (E4 builder
    path — no broker, so the writer is built but not started)."""
    sdf = (spark.readStream.format("rate").option("rowsPerSecond", "1")
           .load()
           .select(F.lit("T_insert").alias("topic"),
                   F.col("value").cast("string").alias("value")))
    writer = kafka_sink(sdf, "broker:9092", str(tmp_path / "ck"))
    assert writer is not None


def test_offsets_json_wire_format():
    """A2's startingOffsets JSON: string partition keys, int offsets."""
    assert offsets_json("latest") == "latest"
    assert offsets_json("earliest") == "earliest"
    got = json.loads(offsets_json({"ods_base_log": {0: 1234, 1: 5678}}))
    assert got == {"ods_base_log": {"0": 1234, "1": 5678}}
