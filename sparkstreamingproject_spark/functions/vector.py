"""Vector column functions over ``array<float|double>`` embeddings.

All composed from JVM-side higher-order functions (``aggregate``,
``zip_with``) — no Python in the hot path. At 100 TB these run inside
codegen; the Pandas-UDF variants in ``llm.similarity`` exist only for
the batched-BLAS path where matrix multiply beats per-row loops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
