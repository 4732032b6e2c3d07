"""sf1.0 spot-bench of the heaviest kernels (VERDICT r09 §next 6).

The driver testdata tops out at sf0.1; the 100 TB posture claims were
design-verified but never measured past 10× the oracle SF. This script
synthesizes an sf1.0-EQUIVALENT volume by 10× DISJOINT replication of
the sf0.1 tables the five heaviest kernels read:

- ``lineitem``: every key column (orderkey/partkey/suppkey) offset by
  replica·stride → 10 structurally-identical, key-disjoint copies. The
  co-purchase graphs the kernels build become 10 disjoint components
  of the sf0.1 graph — per-key density is held constant while volume
  grows 10×, so measured super-linearity is ENGINE cost (shuffle,
  memory, scheduling), not a data-distribution artifact.
- ``documents``: doc_id offset + every word suffixed with the replica
  tag → 10 disjoint shingle/vocabulary universes (no cross-replica
  near-dups; candidate volume scales exactly linearly by
  construction, same reasoning).

This is a measurement harness, not test data: results land in
SCALE.md between ``<!-- scale:spot -->`` markers; the synthetic tables
live under ``.scale/sf1.0`` (gitignored) and never feed the
correctness gate.

Usage:  python scripts/scale_bench.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(ROOT, ".scale", "sf1.0")
REPLICAS = 10

KERNELS = [
    "graph_kcore_peeling",
    "dedup_basket_setsim",
    "dedup_ngram_jaccard",
    "graph_ppr_seeded",
    "dedup_minhash_lsh",
    # r11 (VERDICT r10 §next 5): the heaviest sidecar, born after the
    # r10 spot-bench — 128 posting rows/doc and the bucket-cap path
    # are exactly where LSH-Ensemble could go super-linear.
    "dedup_containment_lsh_ensemble",
    # r11: SemDeDup with PINNED k=8 cells — fixed k makes the per-cell
    # quadratic grow as (n/k)², so this curve measures the documented
    # trade (production scales k ∝ n; the registered query pins k so
    # the oracle stays checkable). Embeddings replicate by sign-flip
    # isometry (see build_sf1).
    "dedup_semantic_cells",
    # r12 (VERDICT r11 §next 2/6): the k ∝ n variant — its curve is
    # the evidence the pair stage went linear — plus the two heaviest
    # not-yet-curved kernels from the sidecar set.
    "dedup_semantic_cells_scaled",
    "dedup_minhash_containment_estimate",
    "sim_binary_pool_recall_sweep",
    # r12 wave 2: the two-level assignment tree — its curve is the
    # n·(k1+k2) assignment claim measured.
    "sim_ann_hierarchical_cells",
    # r13 (VERDICT r12 §next 4): the heaviest sidecar. The registered
    # anchor pins k=SEM_K, so its pair stage is ~4× the pinned-cells
    # (n/8)² quadratic — its curve is documented through sf0.1 ONLY
    # (SF_CAP below, VERDICT r14 §next 4): the anchor exists for
    # fixed-k oracle checkability, carrying its (n/8)² shape to the
    # sf1.0* tier re-measured a known quadratic for 384 s every round.
    # The `_scaled` variant (k ∝ n, same contract as
    # semantic_cells_scaled) is the production shape and the carried
    # sf1.0* row.
    "dedup_semantic_multiprobe",
    "dedup_semantic_multiprobe_scaled",
    # r13 wave 2: sub-document dedup + reconstruction — no pairwise
    # stage at all (window over md5(chunk) + groupBy(doc_id)), so the
    # curve should read ~linear-with-overhead.
    "dedup_paragraph_reconstruct",
    # r16 (VERDICT r15 §next 8): the LSH-seeded kNN build — its sf1.0*
    # row measures the r16 array-fold rerank (zip_with over n-row
    # quantized arrays instead of the n·d element-join) at 10× volume.
    "embedding_knn_graph",
    # r15 (VERDICT r14 §next 3): the blocked-Levenshtein production
    # shape — prefix-filter candidates over word-tagged disjoint name
    # universes (see build_sf1's part replica), so true-pair volume
    # grows exactly linearly; the curve measures the candidate and
    # verify stages' growth.
    "string_levenshtein_blocked",
]

SFS = [("0.01", "/root/testdata/sf0.01"),
       ("0.1", "/root/testdata/sf0.1"),
       ("1.0*", DST)]

# Documented-quadratic oracle anchors are measured only up to this SF;
# their production (`_scaled`) siblings carry the sf1.0* row.
SF_CAP = {"dedup_semantic_multiprobe": "0.1"}


def build_sf1(spark, rebuild: bool = False) -> None:
    os.makedirs(DST, exist_ok=True)
    li_path = f"{DST}/lineitem.parquet"
    if rebuild or not os.path.isdir(li_path):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        strides = {c: int(li.agg(F.max(c)).first()[0]) + 1
                   for c in ("l_orderkey", "l_partkey", "l_suppkey")}
        reps = None
        for k in range(REPLICAS):
            r = li
            for c, s in strides.items():
                r = r.withColumn(c, F.col(c) + F.lit(k * s))
            reps = r if reps is None else reps.unionByName(r)
        reps.repartition(32).write.mode("overwrite").parquet(li_path)
    doc_path = f"{DST}/documents.parquet"
    if rebuild or not os.path.isdir(doc_path):
        d = spark.read.parquet(f"{SRC}/documents.parquet")
        stride = int(d.agg(F.max("doc_id")).first()[0]) + 1
        reps = None
        for k in range(REPLICAS):
            r = d.withColumn("doc_id", F.col("doc_id") + F.lit(k * stride))
            if k > 0:
                tag = F.lit(f"~{k}")
                r = r.withColumn(
                    "text",
                    F.array_join(F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, tag)), " "))
            reps = r if reps is None else reps.unionByName(r)
        reps.repartition(32).write.mode("overwrite").parquet(doc_path)
    part_path = f"{DST}/part.parquet"
    if rebuild or not os.path.isdir(part_path):
        p = spark.read.parquet(f"{SRC}/part.parquet")
        stride = int(p.agg(F.max("p_partkey")).first()[0]) + 1
        reps = None
        for k in range(REPLICAS):
            r = p.withColumn("p_partkey", F.col("p_partkey") + F.lit(k * stride))
            if k > 0:
                # word-tag every name token (same disjoint-universe
                # reasoning as documents): cross-replica Levenshtein
                # distance is >= one edit per word > the verify
                # threshold, so true near-match pairs stay strictly
                # intra-replica and scale linearly by construction
                tag = F.lit(f"~{k}")
                r = r.withColumn(
                    "p_name",
                    F.array_join(F.transform(
                        F.split("p_name", " "),
                        lambda w: F.concat(w, tag)), " "))
            reps = r if reps is None else reps.unionByName(r)
        reps.repartition(8).write.mode("overwrite").parquet(part_path)
    replicate_embeddings(spark, DST, REPLICAS, rebuild=rebuild)


def replicate_embeddings(spark, dst: str, replicas: int,
                         rebuild: bool = False) -> None:
    """N-fold key-disjoint embedding replication (shared with the
    SemDeDup decade bench, scripts/semdedup_decade_bench.py)."""
    emb_path = f"{dst}/embeddings.parquet"
    if not rebuild and os.path.isdir(emb_path):
        return
    os.makedirs(dst, exist_ok=True)
    em = spark.read.parquet(f"{SRC}/embeddings.parquet")
    stride = int(em.agg(F.max("vec_id")).first()[0]) + 1
    dim = len(em.select("embedding").first()[0])
    reps = None
    for k in range(replicas):
        r = em.withColumn("vec_id", F.col("vec_id") + F.lit(k * stride))
        if k > 0:
            # per-replica diagonal sign flip: an ISOMETRY, so every
            # intra-replica cosine (and hence the near-dup structure
            # per replica) is bit-preserved, while cross-replica
            # cosines decorrelate — same disjoint-universe reasoning
            # as the word-tagged documents above
            # signs from an md5 bit per (k, j): the old
            # (k*31 + j*7) % 3 pattern collapsed to (k+j) % 3
            # (31≡7≡1 mod 3), making replicas with equal k mod 3
            # bit-identical — which contaminated the semantic-cells
            # scale measurement (ADVICE r11). A hash bit has no
            # period, so all REPLICAS genuinely decorrelate.
            import hashlib
            signs = F.array(*[
                F.lit(1.0 if hashlib.md5(
                    f"{k}-{j}".encode()).digest()[0] & 1 else -1.0)
                for j in range(dim)])
            r = r.withColumn(
                "embedding",
                F.zip_with("embedding", signs,
                           lambda x, s: (x * s).cast("float")))
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(32).write.mode("overwrite").parquet(emb_path)


def _isolate(spark) -> None:
    """Reset session state between measurements so each kernel is
    timed on a quiet JVM, not against the PREVIOUS kernel's async
    cleanup. Found while building this bench: after the iterative
    k-core kernel (12 rounds of localCheckpoints + AQE runtime
    broadcasts), the NEXT query ran 5-7× slow (110 s vs 16 s for
    dedup_basket_setsim at sf1.0) until the ContextCleaner drained —
    unpersist alone did not fix it; releasing references, forcing
    GC, and giving the cleaner ~10 s did. Production analogue in
    SCALE.md §scale-curves."""
    from sparkstreamingproject_spark.session import drain_cleaner
    drain_cleaner(spark, wait_s=10.0)


def main() -> None:
    spark = get_spark("scale-bench")
    build_sf1(spark, rebuild="--rebuild" in sys.argv)
    spark.read.parquet(f"{SRC}/region.parquet").count()  # warm JVM

    kernels = KERNELS
    if "--only" in sys.argv:  # measure a subset (new-kernel curves)
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        kernels = [k for k in KERNELS if k in only]

    results: dict[str, dict[str, float]] = {k: {} for k in kernels}
    sf_order = [label for label, _ in SFS]
    for label, sf_dir in SFS:
        for name in kernels:
            cap = SF_CAP.get(name)
            if cap is not None and sf_order.index(label) > sf_order.index(cap):
                print(f"  {name} @ sf{label}: skipped (anchor capped at "
                      f"sf{cap}; the `_scaled` sibling carries this tier)",
                      flush=True)
                continue
            _isolate(spark)
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            results[name][label] = dt
            print(f"  {name} @ sf{label}: {dt}s ({n} rows)", flush=True)

    lines = ["| kernel | sf0.01 | sf0.1 | sf1.0* | 0.1→1.0 ratio |",
             "|---|---|---|---|---|"]
    for name in kernels:
        r = results[name]
        if "1.0*" not in r:
            lines.append(f"| {name} | {r['0.01']} s | {r['0.1']} s "
                         f"| capped (sf0.1-only anchor) | — |")
            continue
        ratio = round(r["1.0*"] / r["0.1"], 1) if r["0.1"] else float("inf")
        lines.append(f"| {name} | {r['0.01']} s | {r['0.1']} s "
                     f"| {r['1.0*']} s | {ratio}× |")
    block = "\n".join(lines)
    print(block)
    print(json.dumps({"scale_spot": results}))

    path = os.path.join(ROOT, "SCALE.md")
    with open(path) as f:
        body = f.read()
    start, end = "<!-- scale:spot -->", "<!-- /scale:spot -->"
    if kernels != KERNELS:
        print("subset run: SCALE.md not patched (merge rows by hand)")
    elif start in body:
        pre, rest = body.split(start, 1)
        _, post = rest.split(end, 1)
        body = pre + start + "\n" + block + "\n" + end + post
        with open(path, "w") as f:
            f.write(body)
        print(f"patched {path}")
    spark.stop()


if __name__ == "__main__":
    main()
