"""Decompose the iterative graph kernels' scale slope (VERDICT r14
§next 7): graph_kcore_peeling read 3.1x and graph_ppr_seeded 3.4x for
10x data in the r14 spot table — both are bounded-round iterative
kernels whose per-round state is node/edge-linear, so the slope must
be either (a) a stage that genuinely grows superlinearly, or (b)
fixed round-barrier overhead amortizing differently across SFs. This
script times each stage (edge build, degree build, every peeling/PPR
round) separately at sf0.1 and sf1.0*, so the two explanations are
distinguishable in one run.

Usage:  python scripts/graph_profile.py [--kernels kcore,ppr]
Writes a decomposition table to stdout (merge into SCALE.md by hand).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingproject_spark.session import drain_cleaner, get_spark  # noqa: E402
from sparkstreamingproject_spark.queries.base import table  # noqa: E402
from sparkstreamingproject_spark.queries.analytics23 import _KC_ROUNDS  # noqa: E402
from sparkstreamingproject_spark.queries.analytics28 import (  # noqa: E402
    _PPR_ROUNDS, _PPR_SEEDS, _PPR_SEED_Q)

SFS = [("0.1", "/root/testdata/sf0.1"),
       ("1.0*", os.path.join(ROOT, ".scale", "sf1.0"))]


def _t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    return r


def profile_kcore(spark, sf_dir) -> dict:
    """Stage walls for graph_kcore_peeling's exact construction."""
    out: dict[str, float] = {}
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    e = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")))
         .select(F.col("a.l_partkey").alias("u"),
                 F.col("b.l_partkey").alias("v"))
         .distinct())
    dirn = (e.select(F.col("u").alias("na"), F.col("v").alias("nb"))
            .unionAll(e.select(F.col("v").alias("na"),
                               F.col("u").alias("nb"))))
    dirn = _t("edges_ckpt", lambda: dirn.localCheckpoint(), out)
    degrees = (dirn.groupBy(F.col("na").alias("node"))
               .agg(F.count("*").cast("long").alias("d")))
    degrees = _t("degrees_ckpt", lambda: degrees.localCheckpoint(), out)
    kk = (degrees.agg((F.expr("(3 * sum(d)) div (4 * count(*))") + 1)
                      .cast("long").alias("k")))
    kk = _t("k_ckpt", lambda: kk.localCheckpoint(), out)
    for i in range(_KC_ROUNDS):
        below = F.col("d") < F.col("k")
        removed = (degrees.crossJoin(F.broadcast(kk))
                   .filter(below)
                   .select(F.col("node").alias("nb")))
        surv = (degrees.crossJoin(F.broadcast(kk))
                .filter(~below).select("node", "d"))
        lost = (dirn.join(removed, "nb")
                .groupBy(F.col("na").alias("node"))
                .agg(F.count("*").cast("long").alias("lost")))
        nxt = (surv.join(lost, "node", "left")
               .select("node",
                       (F.col("d") - F.coalesce("lost", F.lit(0)))
                       .cast("long").alias("d")))
        degrees = _t(f"round{i}", lambda: nxt.localCheckpoint(), out)
    out["total"] = round(sum(out.values()), 2)
    return out


def profile_ppr(spark, sf_dir) -> dict:
    """Stage walls for graph_ppr_seeded's exact construction."""
    out: dict[str, float] = {}
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    e = (li.alias("a").join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")))
         .groupBy(F.col("a.l_partkey").alias("u"),
                  F.col("b.l_partkey").alias("v"))
         .agg(F.count("*").alias("w")).filter(F.col("w") >= 2)
         .select("u", "v"))
    adj = e.unionByName(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    adj = _t("edges_ckpt", lambda: adj.localCheckpoint(), out)
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    nodes = adj.select("u").distinct()
    seeds = nodes.orderBy("u").limit(_PPR_SEEDS)
    seed_flag = nodes.join(
        seeds.withColumnRenamed("u", "su"),
        F.col("u") == F.col("su"), "left").select(
        "u", F.col("su").isNotNull().alias("is_seed"))
    r = seed_flag.select(
        "u", F.when(F.col("is_seed"), F.lit(_PPR_SEED_Q)).otherwise(0)
        .cast("long").alias("q"))
    for t in range(_PPR_ROUNDS):
        c = (adj.join(r, "u").join(deg, "u")
             .select(F.col("v").alias("i"),
                     F.expr("q div d").alias("share"))
             .groupBy("i").agg(F.sum("share").cast("long").alias("m")))
        nxt = (seed_flag.join(c, F.col("u") == F.col("i"), "left")
               .select("u",
                       F.expr(f"CAST((85 * coalesce(m, 0) + 15 * "
                              f"(CASE WHEN is_seed THEN {_PPR_SEED_Q} "
                              f"ELSE 0 END)) div 100 AS BIGINT)")
                       .alias("q")))
        r = _t(f"round{t}", lambda: nxt.localCheckpoint(), out)
    _t("topk", lambda: (r.join(seed_flag, "u")
                        .filter(F.col("q") > 0)
                        .select(F.col("u").alias("part"),
                                F.col("q").alias("rank_ppm"), "is_seed")
                        .orderBy(F.desc("rank_ppm"), "part").limit(20)
                        .collect()), out)
    out["total"] = round(sum(out.values()), 2)
    return out


def main() -> None:
    kernels = {"kcore": profile_kcore, "ppr": profile_ppr}
    if "--kernels" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--kernels") + 1].split(","))
        kernels = {k: v for k, v in kernels.items() if k in keep}
    spark = get_spark("graph-profile")
    spark.read.parquet(f"{SFS[0][1]}/region.parquet").count()  # warm
    results: dict[str, dict[str, dict]] = {}
    for name, fn in kernels.items():
        for label, sf_dir in SFS:
            drain_cleaner(spark, wait_s=10.0)
            results.setdefault(name, {})[label] = fn(spark, sf_dir)
            print(f"{name} @ sf{label}: "
                  f"{json.dumps(results[name][label])}", flush=True)
    # ratio table: which stages carry the slope
    for name, r in results.items():
        print(f"\n{name} stage ratios (sf1.0*/sf0.1):")
        for stage, w1 in r["1.0*"].items():
            w0 = r["0.1"].get(stage)
            if w0:
                print(f"  {stage}: {w0} -> {w1}  ({round(w1 / w0, 1)}x)")
    print(json.dumps({"graph_profile": results}))
    spark.stop()


if __name__ == "__main__":
    main()
