"""Grouped feature engineering via ``applyInPandas`` (grouped-map).

The third Python-boundary pattern next to mapInPandas (multimodal) and
applyInPandasWithState (streaming state): per-group vectorized
computation where the group must be seen whole. Example operator:
per-key z-score normalization — the feature-scaling step of a training
pipeline. Arrow moves each group as one pandas frame; the shuffle is
one partitioning by key, same as any groupBy.

For ops expressible with window functions (like this z-score), the
JVM window path is preferred at scale — this operator exists to prove
the pandas path produces identical results (the DuckDB oracle checks
it against the window formulation), so that genuinely non-SQL ops
(sklearn transforms, per-group model scoring) inherit a verified
harness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def zscore_normalize(df: DataFrame, key_col: str, id_col: str,
                     value_col: str, digits: int = 4) -> DataFrame:
    """Per-group z-score: (v - mean) / stddev_samp, rounded."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std and std > 0 else v * float("nan")
        return pd.DataFrame({
            id_col: pdf[id_col],
            key_col: pdf[key_col],
            "z": z.round(digits),
        })

    out_schema = f"{id_col} long, {key_col} long, z double"
    return df.select(key_col, id_col, value_col).groupBy(key_col).applyInPandas(
        norm, out_schema)
