"""Physical-plan inspection helpers.

The 100 TB posture is enforced here: tests assert that point/range
predicates reach the parquet scan (``PushedFilters``), that projections
prune the read schema, and that dim joins broadcast. A plan that scans
all columns for a 2-column projection is a bug even when the result is
correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of all scans in the plan."""
    plan = explain_str(df)
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema of all scans)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols += [f.split(":")[0] for f in m.split(",") if f]
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Under AQE, codegen stages exist only in the executed final plan —
    materialize once, then inspect the executed plan."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    # codegen stages print as "*(N) Operator" in plan strings
    return "WholeStageCodegen" in s or re.search(r"\*\(\d+\) ", s) is not None
