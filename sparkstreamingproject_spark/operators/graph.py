"""Graph analytics on edge-list DataFrames.

Connected components (the dedup canonicalizer) lives in
``llm/dedup.py:connected_components``; this module holds the general
iterative-propagation operators. All of them follow the same
distributed iteration discipline as k-means (llm/similarity.py) and
components: per-round keyed joins + aggregations only (never
whole-graph driver state), ``localCheckpoint`` lineage cuts so plans
stay flat, and 6dp rounding of propagated floats each round so any
executor count / summation order reproduces bit-identical fixpoints —
which is also what makes an unrolled-CTE SQL oracle able to verify the
iteration exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list (simplified: dangling mass is
    not redistributed — documented, and mirrored exactly by the
    oracle). Per iteration: one edges⋈ranks join keyed on src, one
    dst-keyed sum — both partial-aggregated shuffles; rank vectors
    live as DataFrames, never on the driver. The only driver scalar is
    |V| (one count). Returns (node, rank) with rank rounded to 6dp.
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col(src).alias("node")) \
                   .agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0 / n), 6))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (edges
                   .join(ranks.withColumnRenamed("node", src), src)
                   .join(out_deg.withColumnRenamed("node", src), src)
                   .select(F.col(dst).alias("node"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         F.round(F.lit(base)
                                 + damping * F.coalesce(F.col("s"),
                                                        F.lit(0.0)), 6)
                         .alias("rank"))
                 .localCheckpoint())
    return ranks
