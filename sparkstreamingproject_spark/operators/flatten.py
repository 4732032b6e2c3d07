"""Parsing / projection / flattening / explode operators (SURVEY.md §2.B, §2.D).

The reference spends ~120 lines of imperative getter code flattening a
JSON envelope into four flat bean shapes (``OdsBaseLogApp.scala:85-207``).
Here each shape is one declarative projection, so Catalyst collapses
parse→flatten→filter into a single whole-stage-codegen stage and prunes
unread envelope fields out of the scan. These operators work identically
on batch and streaming DataFrames.

Ops covered: B1 json_parse, B2 project_flatten_common, B3 project_page,
B4 struct_pack_serialize, B5 project_cdc_fields, D1 explode_displays,
D2 explode_actions, C2/C3/C4 presence filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import (
    CDC_ENVELOPE_SCHEMA,
    COMMON_RENAMES,
    LOG_ENVELOPE_SCHEMA,
    PAGE_RENAMES,
)


def parse_log_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """B1: JSON string → typed envelope columns.

    Reference: ``JSON.parseObject`` per record, ``OdsBaseLogApp.scala:57-64``.
    """
    return df.select(
        F.from_json(F.col(value_col).cast("string"), LOG_ENVELOPE_SCHEMA).alias("log")
    ).select("log.*")


def parse_cdc_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """B1+B5: Maxwell CDC JSON → (database, table, type, ts, data).

    Reference: ``OdsBaseDbApp.scala:57-63`` (parse), ``:110-112`` (fields).
    """
    return df.select(
        F.from_json(F.col(value_col).cast("string"), CDC_ENVELOPE_SCHEMA).alias("cdc")
    ).select("cdc.*")


def common_cols(prefix: str = "common") -> list[Column]:
    """B2: the 9 common fields with the reference's renames
    (ar→province_id etc., ``OdsBaseLogApp.scala:102-111``)."""
    return [F.col(f"{prefix}.{src}").alias(dst) for src, dst in COMMON_RENAMES.items()]


def page_cols(prefix: str = "page") -> list[Column]:
    """B3: the 6 page-context fields (``OdsBaseLogApp.scala:121-126``),
    renamed per the bean (item→page_item, source_type→sourceType)."""
    return [F.col(f"{prefix}.{src}").alias(dst) for src, dst in PAGE_RENAMES.items()]


def flatten_common(env: DataFrame) -> DataFrame:
    """B2 standalone: envelope → flat common fields + payload columns."""
    return env.select(*common_cols(), "page", "displays", "actions", "start", "err", "ts")


def error_log(env: DataFrame) -> DataFrame:
    """C1 error branch: records carrying an ``err`` payload
    (``OdsBaseLogApp.scala:95-99`` routes by key presence)."""
    return env.filter(F.col("err").isNotNull())


def clean_log(env: DataFrame) -> DataFrame:
    return env.filter(F.col("err").isNull())


def page_log(env: DataFrame) -> DataFrame:
    """PageLog (16 cols, ``bean/PageLog.scala:3-20``): one row per
    non-error envelope with a page block (C2 filter,
    ``OdsBaseLogApp.scala:117-119``). Err records are excluded — the
    reference extracts page/start/display/action inside the ELSE branch
    of the err check (``OdsBaseLogApp.scala:97-100``), so an err record
    goes to the error topic ONLY."""
    return (clean_log(env).filter(F.col("page").isNotNull())
            .select(*_ordered_context(), F.col("ts")))


def _ordered_context() -> list[Column]:
    """The shared 15-field context prefix in bean order
    (mid, user_id, …, sourceType — FIXTURES.md §2)."""
    c = {dst: F.col(f"common.{src}").alias(dst) for src, dst in COMMON_RENAMES.items()}
    p = {dst: F.col(f"page.{src}").alias(dst) for src, dst in PAGE_RENAMES.items()}
    order = ["mid", "user_id", "province_id", "channel", "is_new", "model",
             "operate_system", "version_code", "brand"]
    porder = ["page_id", "last_page_id", "page_item", "page_item_type",
              "during_time", "sourceType"]
    return [c[f] for f in order] + [p[f] for f in porder]


def explode_displays(env: DataFrame) -> DataFrame:
    """D1: one row per ``displays`` element with the 15 parent context
    fields replicated (``OdsBaseLogApp.scala:136-153``,
    ``bean/PageDisplayLog.scala:3-28``). ``explode`` (not outer) drops
    null/empty arrays — that is exactly the C4 guard at ``:137``.
    Err records excluded (else-branch semantics, ``:97-100``).
    """
    return (clean_log(env).filter(F.col("page").isNotNull())
            .select(*_ordered_context(), F.col("ts"),
                    F.explode("displays").alias("d"))
            .select(*[c for c in PAGE_LOG_CONTEXT],
                    F.col("d.display_type").alias("display_type"),
                    F.col("d.item").alias("display_item"),
                    F.col("d.item_type").alias("display_item_type"),
                    F.col("d.order").alias("display_order"),
                    F.col("d.pos_id").alias("display_pos_id"),
                    F.col("ts")))


def explode_actions(env: DataFrame) -> DataFrame:
    """D2: one row per ``actions`` element (``OdsBaseLogApp.scala:156-169``,
    ``bean/PageActionLog.scala:3-27``). Err records excluded
    (else-branch semantics, ``:97-100``)."""
    return (clean_log(env).filter(F.col("page").isNotNull())
            .select(*_ordered_context(), F.col("ts"),
                    F.explode("actions").alias("a"))
            .select(*[c for c in PAGE_LOG_CONTEXT],
                    F.col("a.action_id").alias("action_id"),
                    F.col("a.item").alias("action_item"),
                    F.col("a.item_type").alias("action_item_type"),
                    F.col("a.ts").alias("action_ts"),
                    F.col("ts")))


PAGE_LOG_CONTEXT = [
    "mid", "user_id", "province_id", "channel", "is_new", "model",
    "operate_system", "version_code", "brand", "page_id", "last_page_id",
    "page_item", "page_item_type", "during_time", "sourceType",
]


def start_log(env: DataFrame) -> DataFrame:
    """StartLog (15 cols, ``bean/StartLog.scala:3-21``): C3 filter at
    ``OdsBaseLogApp.scala:174-175``, field extraction ``:174-181``.
    Err records excluded (else-branch semantics, ``:97-100``)."""
    ordered_common = ["mid", "user_id", "province_id", "channel", "is_new",
                      "model", "operate_system", "version_code", "brand"]
    by_dst = {dst: F.col(f"common.{src}").alias(dst)
              for src, dst in COMMON_RENAMES.items()}
    return (clean_log(env).filter(F.col("start").isNotNull())
            .select(*[by_dst[f] for f in ordered_common],
                    F.col("start.entry").alias("entry"),
                    F.col("start.open_ad_id").alias("open_ad_id"),
                    F.col("start.loading_time").alias("loading_time_ms"),
                    F.col("start.open_ad_ms").alias("open_ad_ms"),
                    F.col("start.open_ad_skip_ms").alias("open_ad_skip_ms"),
                    F.col("ts")))


def pack_json(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """B4: assemble a flat struct and serialize to a JSON string for the
    sink (``JSON.toJSONString`` at ``OdsBaseLogApp.scala:129-131``)."""
    cols = cols or df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("value"))
