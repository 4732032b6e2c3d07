"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB, range queries over two correlated dimensions (e.g. time ×
key, lat × lon) read far fewer files if rows are clustered by a
space-filling curve instead of a single sort column: sorting by
``zorder_key(x, y)`` places rows close in *both* dimensions into the
same file, so parquet min/max row-group stats prune on either
predicate. This is the layout trick Delta OPTIMIZE ZORDER applies;
here it is a plain column expression + ``repartitionByRange``/
``sortWithinPartitions`` so it works on vanilla parquet.

The bit-interleave is an unrolled shift/or chain — pure JVM integer
ops inside whole-stage codegen (no UDF). ``zorder_sql`` emits the
identical arithmetic as ANSI SQL from the same loop, so the DuckDB
oracle computes byte-identical keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BITS = 16  # per dimension → 32-bit interleaved key


def zorder_key(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton code: bit b of x → bit 2b+1, bit b of y → bit 2b."""
    xs = x.cast("long").bitwiseAND((1 << bits) - 1)
    ys = y.cast("long").bitwiseAND((1 << bits) - 1)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = (out
               .bitwiseOR(F.shiftleft(F.shiftright(xs, b).bitwiseAND(1),
                                      2 * b + 1))
               .bitwiseOR(F.shiftleft(F.shiftright(ys, b).bitwiseAND(1),
                                      2 * b)))
    return out


def zorder_sql(x_expr: str, y_expr: str, bits: int = BITS) -> str:
    """The same Morton code as ANSI SQL (DuckDB-compatible)."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) & {mask})"
    ys = f"(CAST({y_expr} AS BIGINT) & {mask})"
    parts = []
    for b in range(bits):
        parts.append(f"((({xs} >> {b}) & 1) << {2 * b + 1})")
        parts.append(f"((({ys} >> {b}) & 1) << {2 * b})")
    return "(" + " | ".join(parts) + ")"


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_files: int = 32, bits: int = BITS) -> None:
    """Write parquet clustered by the z-curve: range-partition on the
    z-key (equal-size files via range exchange), sort within each
    partition so row groups get tight min/max on both source columns."""
    (df.withColumn("_zkey", zorder_key(F.col(x), F.col(y), bits))
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))
