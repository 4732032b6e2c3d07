"""Scalar column functions (SURVEY.md §2.H).

All JVM-side built-ins — these stay inside whole-stage codegen. The
reference's scalar usage is upper/concat/cast/json (H1-H5); each maps to
one `pyspark.sql.functions` call, wrapped here only where the reference
gives the composition a name (topic construction, KV keys).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def topic_name(table: Column | str, op: Column | str) -> Column:
    """H1+H2: ``s"${table.toUpperCase}_$op"`` (``OdsBaseDbApp.scala:127``)."""
    t = F.col(table) if isinstance(table, str) else table
    o = F.col(op) if isinstance(op, str) else op
    return F.concat(F.upper(t), F.lit("_"), o)


def dim_key(table: Column | str, id_col: Column | str) -> Column:
    """``s"DIM:${table.toUpperCase}:$id"`` (``OdsBaseDbApp.scala:162``)."""
    t = F.col(table) if isinstance(table, str) else table
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.lit("DIM:"), F.upper(t), F.lit(":"), i)


def json_get(col: Column | str, path: str) -> Column:
    """H4: ad-hoc JSON path extraction (schema-less counterpart of
    ``from_json``) — ``get_json_object`` stays JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def coalesce_str(*cols: Column | str, default: str = "") -> Column:
    """H5: null coalescing."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.coalesce(*cs, F.lit(default))
