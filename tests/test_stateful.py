"""Custom stateful operator + streaming dedup/session tests."""

from __future__ import annotations

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
