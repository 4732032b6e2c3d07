"""E1: the 5-way log split as a streaming job (``OdsBaseLogApp.scala:85-207``).

Two strategies, both correct; choice is a throughput call:

1. ``split_log_stream_to_sinks`` — one ``foreachBatch`` that persists
   the micro-batch once and writes the five filtered projections. This
   is the direct analog of the reference's single-pass routing loop;
   the ``persist()`` plays the role of its shared iterator. Five sinks,
   one source scan per batch.

2. ``tagged_split_writer`` — tag every record with its stream label and
   write ONE partitioned sink (``partitionBy(topic)``); downstream
   consumers read their partition. At 100 TB this halves IO again (no
   per-sink filter pass) and keeps sink file sizes uniform.

For a real Kafka deployment, strategy 2 degenerates to a single Kafka
sink with a ``topic`` column — the broker does the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.flatten import (
    error_log, explode_actions, explode_displays, page_log, start_log,
)
from ..operators.routing import (
    TOPIC_ACTION, TOPIC_DISPLAY, TOPIC_ERROR, TOPIC_PAGE, TOPIC_START,
)


def write_split_batch(batch: DataFrame, batch_id: int, out_dir: str) -> None:
    """One micro-batch → five parquet table appends. Persist once so the
    five filtered writes share the parsed batch (the reference walks its
    iterator once for the same reason)."""
    batch.persist()
    try:
        outputs = {
            TOPIC_ERROR: error_log(batch),
            TOPIC_PAGE: page_log(batch),
            TOPIC_DISPLAY: explode_displays(batch),
            TOPIC_ACTION: explode_actions(batch),
            TOPIC_START: start_log(batch),
        }
        for topic, df in outputs.items():
            (df.write.mode("append").parquet(f"{out_dir}/{topic}"))
    finally:
        batch.unpersist()


def _trigger(writer, trigger_seconds: int | None):
    """None → availableNow (drain-and-stop: tests, backfills);
    int → the reference's 5-second micro-batch cadence."""
    if trigger_seconds is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def split_log_stream_to_sinks(env_stream: DataFrame, out_dir: str,
                              checkpoint: str, trigger_seconds: int | None = 5):
    """Strategy 1: foreachBatch multi-sink (exactly the reference's
    topology, with offsets/commit handled by the checkpoint)."""
    writer = (env_stream.writeStream
              .foreachBatch(lambda b, i: write_split_batch(b, i, out_dir))
              .option("checkpointLocation", checkpoint))
    return _trigger(writer, trigger_seconds).start()


def tagged_split_writer(env_stream: DataFrame, out_dir: str, checkpoint: str,
                        trigger_seconds: int | None = 5):
    """Strategy 2: single tagged pass, partitioned sink. Parent-level
    records only (display/action children need the explode operators —
    run those as their own tagged streams when consumers want them).

    A record can belong to SEVERAL output streams: the reference
    extracts the start block independently of the page block
    (``OdsBaseLogApp.scala:174-188``), so a page+start record emits a
    PageLog row AND a StartLog row — hence an array of labels exploded
    into one row per matching topic. Err stays exclusive (the page/
    start extraction is inside the err check's else branch, ``:97-100``).
    """
    labels = (
        F.when(F.col("err").isNotNull(), F.array(F.lit(TOPIC_ERROR)))
        .otherwise(F.array_compact(F.array(
            F.when(F.col("page").isNotNull(), TOPIC_PAGE),
            F.when(F.col("start").isNotNull(), TOPIC_START)))))
    labels = F.when(F.size(labels) == 0,
                    F.array(F.lit("DWD_OTHER"))).otherwise(labels)
    tagged = env_stream.withColumn("topic", F.explode(labels))
    writer = (tagged.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint)
              .partitionBy("topic"))
    return _trigger(writer, trigger_seconds).start()
