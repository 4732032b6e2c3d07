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
        if v == 0.0:
            # the driver's typed hash distinguishes IEEE -0.0 from +0.0
            # (VERDICT r04: DuckDB round() preserves the sign of a tiny
            # negative, Spark's BigDecimal round() cannot) — collapsing
            # both to "0" here masked that class for three rounds.
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _rowset(rows, colnames) -> list[str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


_DUCK_CANON = {
    "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "UBIGINT": "int", "UINTEGER": "int", "USMALLINT": "int", "UTINYINT": "int",
    "DOUBLE": "float", "FLOAT": "float",
}

_SPARK_CANON = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float",
}


def _type_drift(spark_dtypes, duck_types) -> list[str]:
    """Columns whose numeric kind differs between engines. The driver
    hashes typed values, so DuckDB's sum(BIGINT) → HUGEINT (int128)
    hash-mismatches Spark's BIGINT even when every value is equal —
    this check reproduces that failure locally (VERDICT r01 §wrong 1-2)."""
    duck = {name: _DUCK_CANON.get(str(t).upper(), "other")
            for name, t in duck_types.items()}
    bad = []
    for name, st in spark_dtypes:
        sc = _SPARK_CANON.get(st, "other")
        dc = duck.get(name, "other")
        if dc == "hugeint" or (sc != dc and "other" not in (sc, dc)):
            bad.append(f"{name}: spark={st} duck={dc}")
    return bad


def compare(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    res = con.sql(oracle)
    duck_cols = res.columns
    duck_types = dict(zip(res.columns, res.types))
    duck_rows = res.fetchall()
    con.close()

    drift = _type_drift(sdf.dtypes, duck_types)
    if drift:
        return False, f"type drift (driver hash would fail): {drift}"
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
