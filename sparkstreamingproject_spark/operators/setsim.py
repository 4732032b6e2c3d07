"""Set-similarity self-join with prefix filtering (AllPairs/PPJoin).

Finds all pairs of records whose item sets have Jaccard >= t without
enumerating all pairs: order each set's items rarest-first by global
frequency, keep only the first |s| - ceil(t*|s|) + 1 items (the
"prefix" — two sets with Jaccard >= t MUST share at least one prefix
token under a common global order), generate candidates by joining on
shared prefix tokens, then verify the exact Jaccard on the full sets.

Scale shape: candidate volume is sum over prefix tokens of (token
frequency)^2 — the rarest-first order makes prefixes low-frequency, so
this is orders of magnitude below the |R|^2 of a naive theta-join, and
every step is a plain hash join / aggregation that shuffles on token
or pair keys. The final verify touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def setsim_self_join(rel: DataFrame, key_col: str, item_col: str,
                     threshold_pct: int = 50) -> DataFrame:
    """All (ka < kb) pairs with Jaccard(items_a, items_b) >=
    threshold_pct/100. Returns (ka, kb, inter, sa, sb, jac_bp) with
    jac_bp the Jaccard in truncated integer basis points.

    ``rel`` is (key, item) rows; duplicates are collapsed.
    """
    pairs = rel.select(key_col, item_col).distinct()
    freq = pairs.groupBy(item_col).agg(F.count("*").alias("f"))
    # rarest-first global item order, ties by item value
    ordered = (pairs.join(freq, item_col)
               .groupBy(key_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct("f", item_col))).alias("sorted_items")))
    sets = ordered.select(
        F.col(key_col).alias("k"),
        F.transform("sorted_items", lambda s: s[item_col])
        .alias("items"),
        F.size("sorted_items").cast("bigint").alias("sz"))
    # prefix length for Jaccard t: |s| - ceil(t|s|) + 1
    t = threshold_pct
    prefix_len = (F.col("sz")
                  - F.ceil(F.col("sz") * t / 100).cast("bigint")
                  + F.lit(1))
    # candidate generation carries ONLY keys: a pair sharing k prefix
    # tokens would otherwise shuffle k copies of both full item arrays
    # and run distinct() over whole-array rows — the standard PPJoin
    # formulation dedups (ka, kb) first and joins the sets back once
    pref = (sets.select("k",
                        F.explode(F.slice("items", 1, prefix_len))
                        .alias("tok")))
    cand = (pref.select(F.col("k").alias("ka"), "tok")
            .join(pref.select(F.col("k").alias("kb"), "tok"), "tok")
            .filter(F.col("ka") < F.col("kb"))
            .select("ka", "kb")
            .distinct())
    sa = sets.select(F.col("k").alias("ka"), F.col("items").alias("ia"),
                     F.col("sz").alias("sa"))
    sb = sets.select(F.col("k").alias("kb"), F.col("items").alias("ib"),
                     F.col("sz").alias("sb"))
    inter = F.size(F.array_intersect("ia", "ib")).cast("bigint")
    verified = (cand.join(sa, "ka").join(sb, "kb")
                .withColumn("inter", inter)
                .filter(F.col("inter") * 100
                        >= (F.col("sa") + F.col("sb") - F.col("inter"))
                        * t)
                .select("ka", "kb", "inter", "sa", "sb",
                        F.expr("(inter * 10000) div (sa + sb - inter)")
                        .alias("jac_bp")))
    return verified
