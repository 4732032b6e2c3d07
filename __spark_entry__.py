"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``sparkstreamingproject_spark.queries`` —
one entry per operator from SURVEY.md §2 plus the relational core,
event-time (streaming batch-equivalent) and LLM-pipeline surfaces.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreamingproject_spark.queries import ORACLES, QUERIES, REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's signature computation — the 5-way
    log split (``OdsBaseLogApp.scala:85-207``) — re-expressed as one
    tagged aggregation pass (SURVEY.md §7.1).
    """
    return REGISTRY["split_5way_log"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return QUERIES()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (same parquet views)."""
    return ORACLES()
