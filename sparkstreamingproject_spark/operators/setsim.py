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
    # r15: sets feeds the prefix explode AND both verify sides — and
    # collect_list is a non-deterministic aggregate, so the three
    # consumer subtrees canonicalize unequal and ReusedExchange never
    # fires: the r14 plan re-ran the distinct + freq join + sort
    # groupBy chain (6 scans of the base relation) once per consumer.
    # One key-cardinality cut = one build.
    sets = sets.localCheckpoint()
    # prefix length for Jaccard t: |s| - ceil(t|s|) + 1
    t = threshold_pct
    prefix_len = (F.col("sz")
                  - F.ceil(F.col("sz") * t / 100).cast("bigint")
                  + F.lit(1))
    # candidate generation (PPJoin proper — r10, after the sf1.0 spot
    # bench measured the plain prefix self-join 24× from sf0.1→sf1.0):
    # per-token POSTING LISTS with pairwise expansion in one array HOF
    # — ONE shuffle keyed on the token instead of shuffling the prefix
    # relation twice into a join — and two sound pruning filters
    # applied BEFORE a pair is ever emitted:
    #   length:     J(a,b) >= t  ⟹  t·max(sz) <= 100·min(sz)
    #   positional: overlap <= 1 + min(sa - pa, sb - pb) for a token
    #               at (1-based) prefix positions pa/pb, and J >= t
    #               needs overlap >= ceil(t(sa+sb)/(100+t)) — compare
    #               cross-multiplied, all integers, no ceil.
    # Both drop only pairs that cannot pass the exact verify, so the
    # output (and the shared-item oracle) is unchanged. Measured at
    # the sf1.0 replica: 44.5M candidates → 6.5M, 136 s → 46 s.
    pref = (sets.select(
        "k", "sz",
        F.posexplode(F.slice("items", 1, prefix_len))
        .alias("pos0", "tok")))
    lists = (pref.groupBy("tok")
             .agg(F.sort_array(F.collect_set(
                 F.struct("k", "sz", (F.col("pos0") + 1).alias("p"))))
                 .alias("es"))
             .filter(F.size("es") >= 2))
    pair_expr = F.expr(f"""
        flatten(transform(es, (a, i) ->
          filter(transform(slice(es, i + 2, size(es) - i - 1),
                           b -> struct(a.k AS ka, b.k AS kb,
                                       a.sz AS sa, a.p AS pa,
                                       b.sz AS sb, b.p AS pb)),
                 x -> {t} * greatest(x.sa, x.sb)
                        <= 100 * least(x.sa, x.sb)
                      AND (1 + least(x.sa - x.pa, x.sb - x.pb))
                            * (100 + {t}) >= {t} * (x.sa + x.sb))))""")
    cand = (lists.select(F.explode(pair_expr).alias("pr"))
            .select("pr.ka", "pr.kb")
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
