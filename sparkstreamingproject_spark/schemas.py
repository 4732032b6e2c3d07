"""StructType schemas for the engine.

Re-declares the reference's data shapes (SURVEY.md §1, FIXTURES.md) as
explicit Spark schemas. The reference parses JSON dynamically with
fastjson (``OdsBaseLogApp.scala:57-64``); declaring the schema up front
lets ``from_json`` produce typed columns Catalyst can prune and push
down — at 100 TB, schema-on-read with declared schemas avoids a full
schema-inference pass and keeps scans columnar.

Reference citations:
- log envelope navigated at ``OdsBaseLogApp.scala:95-188``
- common-field renames at ``OdsBaseLogApp.scala:102-111``
- DWD beans at ``bean/PageLog.scala:3-20``, ``bean/PageDisplayLog.scala:3-28``,
  ``bean/PageActionLog.scala:3-27``, ``bean/StartLog.scala:3-21``
- Maxwell CDC envelope read at ``OdsBaseDbApp.scala:110-160``
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _l(name: str) -> StructField:
    return StructField(name, LongType(), True)


# --- behavioral-log envelope (FIXTURES.md §1) -------------------------------

COMMON_SCHEMA = StructType([
    _s("ar"), _s("ba"), _s("ch"), _s("is_new"), _s("md"),
    _s("mid"), _s("os"), _s("uid"), _s("vc"),
])

PAGE_SCHEMA = StructType([
    _l("during_time"), _s("item"), _s("item_type"),
    _s("last_page_id"), _s("page_id"), _s("source_type"),
])

DISPLAY_SCHEMA = StructType([
    _s("display_type"), _s("item"), _s("item_type"), _s("order"), _s("pos_id"),
])

ACTION_SCHEMA = StructType([
    _s("action_id"), _s("item"), _s("item_type"), _l("ts"),
])

START_SCHEMA = StructType([
    _s("entry"), _l("loading_time"), _s("open_ad_id"),
    _l("open_ad_ms"), _l("open_ad_skip_ms"),
])

LOG_ENVELOPE_SCHEMA = StructType([
    StructField("common", COMMON_SCHEMA, True),
    StructField("page", PAGE_SCHEMA, True),
    StructField("displays", ArrayType(DISPLAY_SCHEMA), True),
    StructField("actions", ArrayType(ACTION_SCHEMA), True),
    StructField("start", START_SCHEMA, True),
    _s("err"),
    _l("ts"),
])

# --- Maxwell CDC envelope (FIXTURES.md §3) ----------------------------------

CDC_ENVELOPE_SCHEMA = StructType([
    _s("database"),
    _s("table"),
    _s("type"),
    _l("ts"),
    StructField("data", MapType(StringType(), StringType()), True),
])

# --- DWD output schemas (the reference's four beans) ------------------------

# 9 common context fields with the reference's renames applied
# (ar→province_id, ba→brand, ch→channel, md→model, os→operate_system,
#  uid→user_id, vc→version_code — OdsBaseLogApp.scala:102-111)
COMMON_RENAMES: dict[str, str] = {
    "ar": "province_id", "ba": "brand", "ch": "channel", "is_new": "is_new",
    "md": "model", "mid": "mid", "os": "operate_system", "uid": "user_id",
    "vc": "version_code",
}

PAGE_RENAMES: dict[str, str] = {
    "during_time": "during_time", "item": "page_item",
    "item_type": "page_item_type", "last_page_id": "last_page_id",
    "page_id": "page_id", "source_type": "sourceType",
}

PAGE_LOG_FIELDS = [
    "mid", "user_id", "province_id", "channel", "is_new", "model",
    "operate_system", "version_code", "brand", "page_id", "last_page_id",
    "page_item", "page_item_type", "during_time", "sourceType", "ts",
]

PAGE_DISPLAY_LOG_FIELDS = PAGE_LOG_FIELDS[:-1] + [
    "display_type", "display_item", "display_item_type",
    "display_order", "display_pos_id", "ts",
]

PAGE_ACTION_LOG_FIELDS = PAGE_LOG_FIELDS[:-1] + [
    "action_id", "action_item", "action_item_type", "action_ts", "ts",
]

START_LOG_FIELDS = [
    "mid", "user_id", "province_id", "channel", "is_new", "model",
    "operate_system", "version_code", "brand", "entry", "open_ad_id",
    "loading_time_ms", "open_ad_ms", "open_ad_skip_ms", "ts",
]

# --- testdata star schema table names (TESTDATA.md) -------------------------

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
