"""Deterministic synthetic fixtures for the reference's input shapes
(FIXTURES.md §1/§3) — behavioral-log envelopes and Maxwell CDC rows.
Seeded RNG, no wall-clock dependence.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingproject_spark.schemas import CDC_ENVELOPE_SCHEMA, LOG_ENVELOPE_SCHEMA

BASE_TS = 1_700_000_000_000  # epoch ms


def make_log_envelopes(n: int = 200, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        common = {
            "ar": str(rng.randint(1, 34)), "ba": rng.choice(["Xiaomi", "Huawei", "iPhone"]),
            "ch": rng.choice(["appstore", "web", "oppo"]), "is_new": rng.choice(["0", "1"]),
            "md": f"model-{rng.randint(1, 9)}", "mid": f"mid_{i}",
            "os": rng.choice(["Android 11", "iOS 13"]), "uid": str(rng.randint(1, 50)),
            "vc": "v2.1.134",
        }
        has_err = rng.random() < 0.05
        has_page = rng.random() < 0.7
        has_start = not has_page or rng.random() < 0.1
        page = None
        displays = None
        actions = None
        if has_page:
            page = {"during_time": rng.randint(1000, 20000),
                    "item": str(rng.randint(1, 30)), "item_type": "sku_id",
                    "last_page_id": rng.choice([None, "home", "cart"]),
                    "page_id": rng.choice(["home", "good_detail", "cart", "trade"]),
                    "source_type": rng.choice(["promotion", "query", None])}
            displays = [{"display_type": rng.choice(["promotion", "query"]),
                         "item": str(rng.randint(1, 30)), "item_type": "sku_id",
                         "order": str(k + 1), "pos_id": str(rng.randint(1, 5))}
                        for k in range(rng.randint(0, 3))] or None
            actions = [{"action_id": rng.choice(["favor_add", "cart_add"]),
                        "item": str(rng.randint(1, 30)), "item_type": "sku_id",
                        "ts": BASE_TS + i * 1000 + 500}
                       for _ in range(rng.randint(0, 2))] or None
        start = None
        if has_start:
            start = {"entry": rng.choice(["icon", "notice"]),
                     "loading_time": rng.randint(500, 5000),
                     "open_ad_id": str(rng.randint(1, 20)),
                     "open_ad_ms": rng.randint(100, 9000),
                     "open_ad_skip_ms": rng.randint(0, 500)}
        rows.append({"common": common, "page": page, "displays": displays,
                     "actions": actions, "start": start,
                     "err": '{"code":1001}' if has_err else None,
                     "ts": BASE_TS + i * 1000})
    return rows


def log_envelope_df(spark: SparkSession, n: int = 200, seed: int = 7) -> DataFrame:
    return spark.createDataFrame(make_log_envelopes(n, seed), LOG_ENVELOPE_SCHEMA)


def make_cdc_rows(n: int = 100, seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    tables = ["order_info", "order_detail", "user_info", "base_province"]
    types = ["insert", "insert", "update", "bootstrap-insert", "delete", "ddl"]
    rows = []
    for i in range(n):
        t = rng.choice(tables)
        rows.append({
            "database": "gmall", "table": t, "type": rng.choice(types),
            "ts": BASE_TS + i,
            "data": {"id": str(rng.randint(1, 20)), "name": f"row{i}",
                     "amount": str(rng.randint(1, 500))},
        })
    return rows


def cdc_df(spark: SparkSession, n: int = 100, seed: int = 11) -> DataFrame:
    return spark.createDataFrame(make_cdc_rows(n, seed), CDC_ENVELOPE_SCHEMA)
