"""Interleaved A/B adjudication of the two r15 suspects (VERDICT r15
§next 1): ``sim_ann_nprobe_recall_sweep`` and
``dedup_semantic_multiprobe_scaled``, current (r15-rewritten) shape vs
the pre-rewrite 633ac0c shape.

Both variants run in ONE session, strictly interleaved
(A,B,A,B,… — this host shows 2-4x wall spikes between adjacent
minutes, so sequential befores/afters are meaningless), ContextCleaner
drained before every rep, min-of-N per variant reported.

The OLD shapes are reproduced verbatim from ``git show 633ac0c``
below but call the CURRENT kernels (ivf_topk / brute_force_topk /
kmeans_centroids), so the comparison isolates the r15 QUERY-level
rewrites (sweep-sharing; top-2 window narrowing) from the shared
kernel changes both variants inherit.

Usage: python scripts/ab_r16_suspects.py [reps_per_variant]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.queries.llm8 import (  # noqa: E402
    _NP_K, _NP_MOD, _NP_PROBES)
from sparkstreamingproject_spark.queries.llm19 import (  # noqa: E402
    SEM_ITER, SEM_K, SEM_TARGET, SEM_THRESHOLD)
from sparkstreamingproject_spark.queries.base import table  # noqa: E402
from sparkstreamingproject_spark.session import (  # noqa: E402
    drain_cleaner, get_spark)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def nprobe_old(spark, sf_dir):
    """633ac0c sim_ann_nprobe_recall_sweep: ivf_topk + gt per arm."""
    from sparkstreamingproject_spark.llm.similarity import (
        brute_force_topk, ivf_topk)
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % _NP_MOD == 0)
    gt = brute_force_topk(emb, q, k=_NP_K).select("query_id", "cand_id")
    nq = q.agg(F.count("*").alias("n_queries"))
    res = None
    for np_ in _NP_PROBES:
        ann = (ivf_topk(emb, q, k=_NP_K, nprobe=np_)
               .select("query_id", "cand_id"))
        r = (gt.join(ann, ["query_id", "cand_id"])
             .agg(F.count("*").alias("n_hits"))
             .withColumn("nprobe", F.lit(np_)))
        res = r if res is None else res.unionByName(r)
    return (res.crossJoin(F.broadcast(nq))
            .select(F.col("nprobe").cast("int").alias("nprobe"),
                    "n_queries", "n_hits",
                    F.round(F.col("n_hits")
                            / (F.col("n_queries") * _NP_K), 6)
                    .alias("recall")))


def _multiprobe_old(spark, sf_dir, k):
    """633ac0c _multiprobe: wide top-2 window (v inside the exchange),
    unsalted cell-keyed pair join."""
    from sparkstreamingproject_spark.llm.similarity import (
        cosine_similarity, kmeans_centroids)
    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    cents = kmeans_centroids(emb, k=k, n_iter=SEM_ITER)
    scored = (pts.crossJoin(F.broadcast(cents))
              .select("vec_id", "v", "cell",
                      F.round(cosine_similarity("v", "cv"), 6)
                      .alias("sim")))
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cell")
    top2 = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("vec_id", "v", "cell", "rn")
            .localCheckpoint())
    prim = (top2.filter(F.col("rn") == 1)
            .select("vec_id", F.col("cell").alias("pcell")))
    a = top2.select(F.col("vec_id").alias("id_a"),
                    F.col("v").alias("va"), "cell")
    b = top2.select(F.col("vec_id").alias("id_b"),
                    F.col("v").alias("vb"), "cell")
    pairs = (a.join(b, "cell")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(cosine_similarity("va", "vb"), 4)
                     .alias("cosine"))
             .filter(F.col("cosine") >= SEM_THRESHOLD)
             .dropDuplicates(["id_a", "id_b"]))
    return (pairs
            .join(prim.withColumnRenamed("vec_id", "id_a")
                  .withColumnRenamed("pcell", "pcell_a"), "id_a")
            .join(prim.withColumnRenamed("vec_id", "id_b")
                  .withColumnRenamed("pcell", "pcell_b"), "id_b")
            .select("id_a", "id_b", "cosine",
                    (F.col("pcell_a") != F.col("pcell_b"))
                    .alias("cross_cell")))


def multiprobe_scaled_old(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(SEM_K, -(-n // SEM_TARGET))
    return _multiprobe_old(spark, sf_dir, int(k))


PAIRS = [
    ("sim_ann_nprobe_recall_sweep",
     REGISTRY["sim_ann_nprobe_recall_sweep"].fn, nprobe_old),
    ("dedup_semantic_multiprobe_scaled",
     REGISTRY["dedup_semantic_multiprobe_scaled"].fn,
     multiprobe_scaled_old),
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-r16-suspects")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def _warm(it):
        import numpy as _np
        _np.ones((8, 8)) @ _np.ones((8, 8))
        yield from it
    n_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (spark.range(n_cores * 4, numPartitions=n_cores * 4)
     .mapInPandas(_warm, "id long").count())

    out = {}
    for name, new_fn, old_fn in PAIRS:
        # result-identity gate before any timing
        new_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
        old_rows = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        same = new_rows == old_rows
        print(f"{name}: results identical = {same}", flush=True)
        times = {"new": [], "old": []}
        for i in range(reps):
            for tag, fn in (("new", new_fn), ("old", old_fn)):
                drain_cleaner(spark, wait_s=5.0)
                spark.sparkContext.setJobDescription(f"ab {name} {tag} #{i}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                t = round(time.perf_counter() - t0, 3)
                times[tag].append(t)
                print(f"  {tag} #{i}: {t:.3f}s", flush=True)
        out[name] = {"identical": same,
                     "new": times["new"], "old": times["old"],
                     "new_min": min(times["new"]),
                     "old_min": min(times["old"])}
    print(json.dumps({"protocol": f"interleaved A/B, min-of-{reps}, "
                                  "drained reps", "sf_dir": SF_DIR,
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
