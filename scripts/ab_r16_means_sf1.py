"""VERDICT r15 §next 9: re-evaluate the r15-REJECTED per-dimension
``avg(v[i])`` centroid means at sf1.0* (the rejection was measured at
sf0.1, where the d-wide aggregate's ~1 s/iteration codegen setup
dominates; the posexplode shape pays two exchanges of the n·d element
relation, which grows with the corpus while the setup cost does not —
the crossover was predicted "somewhere above 10×").

Interleaved A/B of the FULL 2-iteration Lloyd chain (assign via the
shared kmeans_assign; only the means stage differs) on the sf1.0*
key-disjoint embeddings (20k vectors, d=64), at the production
k ∝ n (k=400) and at the r15 comparison point (k=40).

Usage: python scripts/ab_r16_means_sf1.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingproject_spark.llm.similarity import (  # noqa: E402
    kmeans_assign, kmeans_centroids)
from sparkstreamingproject_spark.session import (  # noqa: E402
    drain_cleaner, get_spark)

SF1 = os.path.join(ROOT, ".scale", "sf1.0")


def centroids_avgcols(df, k: int, n_iter: int = 2, dim: int = 64):
    """The rejected-A shape: one cell-keyed hash aggregate with d avg
    columns (one exchange/iteration) instead of posexplode → avg per
    (cell, pos) → collect_list (two exchanges of the n·d relation)."""
    pts = df.select("vec_id",
                    F.col("embedding").cast("array<double>").alias("v"))
    cents = (pts.filter(F.col("vec_id") < k)
             .select(F.col("vec_id").alias("cell"),
                     F.transform("v", lambda x: F.round(x, 6)).alias("cv")))
    for _ in range(n_iter):
        assigned = kmeans_assign(pts, cents)
        cents = (assigned.groupBy("cell")
                 .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}")
                        for i in range(dim)])
                 .select("cell",
                         F.array(*[F.col(f"m{i}")
                                   for i in range(dim)]).alias("cv")))
    return cents


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-r16-means-sf1")
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    emb.count()  # warm

    out = {}
    for k in (400, 40):
        def new_fn():
            return centroids_avgcols(emb, k=k)

        def old_fn():
            return kmeans_centroids(emb, k=k)

        a = sorted((r["cell"], tuple(r["cv"])) for r in new_fn().collect())
        b = sorted((r["cell"], tuple(r["cv"])) for r in old_fn().collect())
        same = a == b
        print(f"k={k}: results identical = {same}", flush=True)
        times = {"avgcols": [], "posexplode": []}
        for i in range(reps):
            for tag, fn in (("avgcols", new_fn), ("posexplode", old_fn)):
                drain_cleaner(spark, wait_s=5.0)
                spark.sparkContext.setJobDescription(
                    f"means k={k} {tag} #{i}")
                t0 = time.perf_counter()
                fn().collect()
                t = round(time.perf_counter() - t0, 3)
                times[tag].append(t)
                print(f"  {tag} #{i}: {t:.3f}s", flush=True)
        out[f"k={k}"] = {"identical": same, **times,
                         "avgcols_min": min(times["avgcols"]),
                         "posexplode_min": min(times["posexplode"])}
    print(json.dumps({"protocol": f"interleaved A/B sf1.0*, "
                                  f"min-of-{reps}", "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
