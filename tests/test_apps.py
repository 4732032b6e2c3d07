"""End-to-end application tests — the reference's two entry points
(SURVEY.md §3.1/§3.2) driven through their CLIs in backfill mode."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F

from sparkstreamingproject_spark.apps import ods_base_db, ods_base_log
from sparkstreamingproject_spark.operators.routing import TOPIC_PAGE, TOPIC_START

from .fixtures import cdc_df, log_envelope_df


@pytest.mark.slow
def test_ods_base_log_app(spark, tmp_path):
    src = str(tmp_path / "landing")
    log_envelope_df(spark, n=150).coalesce(1).write.parquet(src)
    out, ck = str(tmp_path / "dwd"), str(tmp_path / "ck")
    args = ods_base_log.build_parser().parse_args(
        ["--source", src, "--out", out, "--checkpoint", ck, "--once"])
    q = ods_base_log.run(args, spark)
    q.awaitTermination(120)
    env = spark.read.parquet(src)
    # err records route exclusively to the error topic
    # (else-branch semantics, OdsBaseLogApp.scala:97-100)
    assert (spark.read.parquet(f"{out}/{TOPIC_PAGE}").count()
            == env.filter(F.col("err").isNull()
                          & F.col("page").isNotNull()).count())
    assert (spark.read.parquet(f"{out}/{TOPIC_START}").count()
            == env.filter(F.col("err").isNull()
                          & F.col("start").isNotNull()).count())


@pytest.mark.slow
def test_ods_base_db_app(spark, tmp_path):
    src = str(tmp_path / "cdc")
    cdc_df(spark, n=80).coalesce(1).write.parquet(src)
    cfg = tmp_path / "routing.json"
    cfg.write_text(json.dumps({"fact_tables": ["order_info"],
                               "dim_tables": ["user_info"]}))
    out, ck = str(tmp_path / "routed"), str(tmp_path / "ck")
    args = ods_base_db.build_parser().parse_args(
        ["--source", src, "--out", out, "--checkpoint", ck,
         "--routing-config", str(cfg), "--once"])
    q = ods_base_db.run(args, spark)
    q.awaitTermination(120)
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_dim, read_cdc_facts)
    facts = read_cdc_facts(spark, out)
    assert facts.count() > 0
    dim = read_cdc_dim(spark, out, "user_info")
    assert dim.groupBy("id").count().filter("count > 1").count() == 0
