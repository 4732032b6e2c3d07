"""transformWithState (Spark 4 StatefulProcessor) — stream-vs-batch
equality for the running-spend accumulator. Requires protobuf (the
TWS Python worker's wire format); skips where it isn't installed."""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf",
                    reason="transformWithState worker needs protobuf; "
                           "not shipped in this container")

from pyspark.sql import functions as F

from sparkstreamingproject_spark.sources.streams import file_stream
from sparkstreamingproject_spark.streaming.stateful2 import (
    running_spend_stream,
)


@pytest.mark.slow
def test_running_spend_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "tws_land")
    rows = [(i, i % 7, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    df.coalesce(2).write.parquet(src)
    out, ck = str(tmp_path / "tws_out"), str(tmp_path / "tws_ck")
    q = (running_spend_stream(file_stream(spark, src, df.schema))
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user_id"], r["total"], r["n"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["user_id"], r["total"], r["n"])
            for r in df.groupBy("user_id")
            .agg(F.round(F.sum("value"), 2).alias("total"),
                 F.count("*").alias("n")).collect()}
    assert want <= got  # update mode may emit intermediates; finals present
