"""Custom stateful operator + streaming dedup/session tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkstreamingproject_spark.sources.streams import file_stream
from sparkstreamingproject_spark.streaming.stateful import user_profile_stream
from sparkstreamingproject_spark.streaming.windows import session_counts, stream_dedup


def _events_df(spark, n=120):
    rows = [(i, 1_700_000_000_000_000 + i * 30_000_000, i % 7,
             ["view", "click", "purchase"][i % 3], float(i % 10))
            for i in range(n)]
    return (spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double")
        .select("event_id", F.timestamp_micros("ts_us").alias("ts"),
                "user_id", "event_type", "value"))


@pytest.mark.slow
def test_stateful_user_profile(spark, tmp_path):
    """applyInPandasWithState: final state per key equals the batch
    aggregate over the same data."""
    src = str(tmp_path / "land")
    df = _events_df(spark)
    df.coalesce(1).write.parquet(src)

    stream = file_stream(spark, src, df.schema)
    out = str(tmp_path / "profiles")
    ck = str(tmp_path / "ck")
    # update-mode operator → parquet via foreachBatch (the sink itself
    # only appends; each batch appends its updated profiles)
    q = (user_profile_stream(stream)
         .writeStream.outputMode("update")
         .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # one update row per key per batch; the final (max-n) row per key
    # must equal the batch aggregate
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    final = (got.withColumn("rn", F.row_number().over(w))
             .filter("rn = 1").drop("rn"))
    expected = (df.groupBy("user_id")
                .agg(F.count("*").alias("n"), F.sum("value").alias("total")))
    diff = (final.join(expected.withColumnRenamed("n", "en")
                       .withColumnRenamed("total", "etotal"), "user_id")
            .filter((F.col("n") != F.col("en")) |
                    (F.abs(F.col("total") - F.col("etotal")) > 1e-9)))
    assert diff.count() == 0
    assert final.count() == 7


@pytest.mark.slow
def test_funnel_stream_matches_batch(spark, tmp_path):
    """Custom stateful funnel (applyInPandasWithState, EventTimeTimeout)
    equals the batch two-aggregate funnel on the same data — including
    across multiple micro-batches (two landing files)."""
    from sparkstreamingproject_spark.streaming.stateful import funnel_stream

    src = str(tmp_path / "landf")
    df = _events_df(spark, n=240)
    # two files → availableNow replays them as separate micro-batches
    df.filter("event_id < 120").coalesce(1).write.mode("append").parquet(src)
    df.filter("event_id >= 120").coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "funnel")
    ck = str(tmp_path / "ckf")
    q = (funnel_stream(file_stream(spark, src, df.schema))
         .writeStream.outputMode("update")
         .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    us = F.unix_micros(F.col("ts"))
    v = (df.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("first_view_us")))
    pe = (df.filter(F.col("event_type") == "purchase")
          .select(F.col("user_id").alias("uid_p"), us.alias("p_us")))
    p = (pe.join(v, (pe.uid_p == v.user_id)
                 & (pe.p_us > v.first_view_us)
                 & (pe.p_us <= v.first_view_us + 86400000000))
         .groupBy("uid_p").agg(F.min("p_us").alias("first_purchase_us")))
    expected = {(r["user_id"], r["first_view_us"], r["first_purchase_us"])
                for r in v.join(p, v.user_id == p.uid_p)
                .select("user_id", "first_view_us", "first_purchase_us")
                .collect()}
    assert expected, "fixture should contain conversions"

    got_df = spark.read.parquet(out)
    # update mode: last emitted row per user is the refined answer
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(
        F.col("first_purchase_us").asc())
    final = (got_df.withColumn("rn", F.row_number().over(w))
             .filter("rn = 1").drop("rn"))
    got = {(r["user_id"], r["first_view_us"], r["first_purchase_us"])
           for r in final.collect()}
    assert got == expected


@pytest.mark.slow
def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    src = str(tmp_path / "land2")
    df = _events_df(spark)
    df.coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, df.schema)
    out = str(tmp_path / "dedup")
    ck = str(tmp_path / "ckd")
    q = (stream_dedup(stream, ["user_id", "event_type"], "ts", "1 hour")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    expected = df.select("user_id", "event_type").distinct().count()
    assert got.count() == expected
    assert got.select("user_id", "event_type").distinct().count() == expected


@pytest.mark.slow
def test_session_counts_stream(spark, tmp_path):
    """Session windows over a stream: total events across emitted
    sessions equals input (gap chosen so all sessions close)."""
    src = str(tmp_path / "land3")
    df = _events_df(spark)
    df.coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, df.schema)
    out = str(tmp_path / "sess")
    ck = str(tmp_path / "cks")
    q = (session_counts(stream, "user_id", "ts", gap="2 minutes", watermark="1 minute")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # every emitted session is correct vs the batch gaps-and-islands
    batch = (df.groupBy(F.session_window("ts", "2 minutes").alias("sw"), "user_id")
             .agg(F.count("*").alias("n_events"))
             .select("user_id", F.col("sw.start").alias("session_start"), "n_events"))
    diff = (got.alias("g").join(batch.alias("b"), ["user_id", "session_start"])
            .filter(F.col("g.n_events") != F.col("b.n_events")))
    assert diff.count() == 0
    assert got.count() >= 1


@pytest.mark.slow
def test_window_funnel_stream_matches_batch_query(spark, tmp_path, sf_dir):
    """The streaming CEP windowFunnel equals the driver-checked batch
    query window_funnel_levels on the REAL events table, processed
    across many micro-batches (one file per trigger) so chains span
    batch boundaries and state carries them."""
    from sparkstreamingproject_spark.queries import REGISTRY
    from sparkstreamingproject_spark.queries.base import table
    from sparkstreamingproject_spark.streaming.stateful import (
        window_funnel_stream,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    src = str(tmp_path / "wf_land")
    # several files → several availableNow micro-batches
    ev.repartition(6).write.parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = str(tmp_path / "wf_out")
    ck = str(tmp_path / "wf_ck")
    # watermark lag longer than the data span: nothing is late, no
    # chain is dropped — the determinism the batch compare needs
    q = (window_funnel_stream(stream, watermark="3650 days")
         .writeStream.outputMode("update")
         .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.read.parquet(out)
           .groupBy("user_id")
           .agg(F.max("funnel_level").alias("funnel_level")))
    want = REGISTRY["window_funnel_levels"].fn(spark, sf_dir)
    g = {r["user_id"]: r["funnel_level"] for r in got.collect()}
    w = {r["user_id"]: r["funnel_level"] for r in want.collect()}
    assert g == w and len(w) > 0
