"""Custom Python DataSource (Spark 4 extension API) — the engine-native
rebuild of the reference's hand-rolled source layer (MyKafkaUtils):
deterministic partitioned batch reads, micro-batch streaming with
row-position offsets, and checkpoint resume without duplicates."""

from __future__ import annotations

import pytest

from sparkstreamingproject_spark.sources.python_datasource import register


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_partitioned_deterministic(spark):
    register(spark)
    df = _read(spark, rows=400, partitions=5, seed=7)
    assert df.count() == 400
    assert df.rdd.getNumPartitions() == 5
    assert df.select("event_id").distinct().count() == 400
    again = _read(spark, rows=400, partitions=5, seed=7)
    assert df.exceptAll(again).count() == 0
    other_seed = _read(spark, rows=400, partitions=5, seed=8)
    assert df.exceptAll(other_seed).count() > 0


@pytest.mark.slow
def test_stream_drains_and_resumes_from_checkpoint(spark, tmp_path):
    """availableNow drains the finite 'topic'; a restart with a larger
    maxRows resumes from the checkpointed offset — no reprocessing, no
    duplicates (the reference's Redis offset ledger, played by the
    Structured Streaming checkpoint)."""
    register(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run(max_rows):
        q = (spark.readStream.format("synthetic_events")
             .option("maxRows", max_rows).option("rowsPerBatch", 50)
             .option("partitions", 3).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(150)
    first = spark.read.parquet(out)
    assert first.count() == 150
    run(300)
    both = spark.read.parquet(out)
    assert both.count() == 300  # 150 new rows, zero duplicates
    assert both.select("event_id").distinct().count() == 300


@pytest.mark.slow
def test_stream_rows_match_batch_rows(spark, tmp_path):
    """The stream serves byte-identical rows to the batch reader —
    one generator, two access paths (the batch-first verification
    contract applied to the source itself)."""
    register(spark)
    out, ck = str(tmp_path / "bout"), str(tmp_path / "bck")
    q = (spark.readStream.format("synthetic_events")
         .option("maxRows", 120).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    batch = _read(spark, rows=120)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
