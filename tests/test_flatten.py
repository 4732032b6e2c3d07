"""Flatten/explode operator tests against the reference's DWD bean
shapes (SURVEY.md §1.3, FIXTURES.md §2) + the coverage invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingproject_spark.operators.flatten import (
    clean_log, error_log, explode_actions, explode_displays, pack_json,
    page_log, parse_log_envelope, start_log,
)
from sparkstreamingproject_spark.schemas import (
    PAGE_ACTION_LOG_FIELDS, PAGE_DISPLAY_LOG_FIELDS, PAGE_LOG_FIELDS,
    START_LOG_FIELDS,
)

from .fixtures import log_envelope_df

import pytest

pytestmark = pytest.mark.smoke  # ~5-min preflight tier (COVERAGE.md)


def test_page_log_schema_and_counts(spark):
    env = log_envelope_df(spark)
    pl = page_log(env)
    assert pl.columns == PAGE_LOG_FIELDS
    # err records are excluded (else-branch routing, OdsBaseLogApp.scala:97-100)
    assert pl.count() == env.filter(F.col("err").isNull()
                                    & F.col("page").isNotNull()).count()


def test_start_log_schema(spark):
    env = log_envelope_df(spark)
    sl = start_log(env)
    assert sl.columns == START_LOG_FIELDS
    assert sl.count() == env.filter(F.col("err").isNull()
                                    & F.col("start").isNotNull()).count()


def test_explode_display_invariant(spark):
    """count(page_display_log) == sum(size(displays)) — FIXTURES.md §2."""
    env = log_envelope_df(spark)
    dl = explode_displays(env)
    assert dl.columns == PAGE_DISPLAY_LOG_FIELDS
    expected = (env.filter(F.col("err").isNull() & F.col("page").isNotNull())
                .agg(F.sum(F.coalesce(F.size("displays"), F.lit(0))))
                .collect()[0][0])
    assert dl.count() == expected


def test_explode_action_invariant(spark):
    env = log_envelope_df(spark)
    al = explode_actions(env)
    assert al.columns == PAGE_ACTION_LOG_FIELDS
    expected = (env.filter(F.col("err").isNull() & F.col("page").isNotNull())
                .agg(F.sum(F.coalesce(F.size("actions"), F.lit(0))))
                .collect()[0][0])
    assert al.count() == expected


def test_err_routing_partitions_input(spark):
    """error ∪ clean covers every record exactly once (C1)."""
    env = log_envelope_df(spark)
    assert error_log(env).count() + clean_log(env).count() == env.count()
    assert error_log(env).count() > 0


def test_parent_context_replicated(spark):
    """Each display child carries its parent's 15 context fields
    (the denormalization at OdsBaseLogApp.scala:146)."""
    env = log_envelope_df(spark)
    dl = explode_displays(env)
    joined = (dl.select("mid", "ts", "page_id").distinct().alias("d")
              .join(page_log(env).select("mid", "ts", "page_id").distinct().alias("p"),
                    ["mid", "ts", "page_id"], "left_anti"))
    assert joined.count() == 0  # every child context exists as a parent


def test_json_roundtrip(spark):
    """to_json ∘ from_json = id on the envelope (property check §5.4)."""
    env = log_envelope_df(spark, n=50)
    packed = pack_json(page_log(env))
    assert packed.count() == page_log(env).count()
    first = packed.first()["value"]
    assert first.startswith("{") and '"mid"' in first


def test_parse_log_envelope_from_strings(spark):
    """B1: raw JSON strings (the Kafka value shape) parse into the
    declared envelope schema."""
    env = log_envelope_df(spark, n=30)
    as_json = env.select(F.to_json(F.struct(*env.columns)).alias("value"))
    reparsed = parse_log_envelope(as_json)
    assert set(reparsed.columns) == set(env.columns)
    assert reparsed.filter(F.col("common.mid").isNotNull()).count() == 30
