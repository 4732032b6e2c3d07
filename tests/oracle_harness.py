"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query in Spark and its oracle SQL in DuckDB on the
same parquet tables, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple). Catching a mismatch here is much cheaper than
waiting for the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb

from sparkstreamingproject_spark.schemas import TABLES


def _norm(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _rowset(rows, colnames) -> list[str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    res = con.sql(oracle)
    duck_cols = res.columns
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = _rowset([tuple(r) for r in spark_rows], spark_cols)
    d = _rowset(duck_rows, duck_cols)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(spark_rows)} rows)"
