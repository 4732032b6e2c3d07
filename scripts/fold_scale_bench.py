"""Streaming-ingest FOLD scale bench (VERDICT r13 §next 3).

Every heavy batch kernel has a three-decade scale curve in SCALE.md;
the maintained FOLDS did not. This script runs the two heaviest folds
— #14 (semantic cells, `streaming/semantic_maintain.py`) and #16
(paragraph ingest, `streaming/paragraph_maintain.py`) — over the
sf1.0* replicated corpus (`scale_bench.build_sf1`) as N micro-batches
and records:

- wall per micro-batch (the sustained-ingest number; the reference's
  DStream apps exist for exactly this shape),
- the last/median batch ratio (per-batch cost may grow with
  accumulated state — prior-hash anti-join for #16, new×prior
  same-cell pairs for #14 — but must stay BOUNDED; a fold whose tail
  batches blow up is a fold you cannot run continuously),
- read-time materialization wall, and
- an engine-side equality check: the fold's read-time result must
  equal the batch query recomputed on the same sf1.0* corpus
  (exceptAll both directions — no driver-side collect of the corpus).

Batching honors each fold's ordering contract: #16 ingests doc_id-
ordered ranges (the stream≡batch condition), #14 splits by
vec_id % N (order-free: components/keepers recompute at read time).

Results land in SCALE.md between ``<!-- scale:folds -->`` markers.

Usage:  python scripts/fold_scale_bench.py [--batches N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_bench import DST, build_sf1  # noqa: E402
from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.queries.llm15 import (  # noqa: E402
    SEM_ITER, SEM_K, SEM_TARGET)
from sparkstreamingproject_spark.session import (  # noqa: E402
    drain_cleaner, get_spark)
from sparkstreamingproject_spark.streaming.paragraph_maintain import (  # noqa: E402
    fold_paragraphs, paragraph_dedup_from_state)
from sparkstreamingproject_spark.streaming.semantic_maintain import (  # noqa: E402
    fold_semantic_cells, init_semantic_state, semantic_dedup_from_state)


def _assert_equal(got, exp, label: str) -> None:
    extra = got.exceptAll(exp).count()
    missing = exp.exceptAll(got).count()
    assert extra == 0 and missing == 0, (
        f"{label}: fold result != batch recompute "
        f"(extra={extra}, missing={missing})")


def run_paragraph(spark, state_root: str, n_batches: int) -> dict:
    docs = spark.read.parquet(f"{DST}/documents.parquet") \
        .select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    step = -(-hi // n_batches)
    st = os.path.join(state_root, "para_state")
    walls = []
    for i in range(n_batches):
        # drain BEFORE checkpointing the batch — drain_cleaner
        # unpersists every persistent RDD, including a fresh
        # localCheckpoint (found while building this bench)
        drain_cleaner(spark, wait_s=3.0)
        b = docs.filter((F.col("doc_id") >= i * step)
                        & (F.col("doc_id") < (i + 1) * step)) \
            .localCheckpoint()  # materialize source outside the clock
        t0 = time.perf_counter()
        fold_paragraphs(b, st, batch_id=i)
        walls.append(round(time.perf_counter() - t0, 2))
        print(f"  fold16 batch {i}: {walls[-1]}s", flush=True)
    drain_cleaner(spark, wait_s=5.0)
    t0 = time.perf_counter()
    got = paragraph_dedup_from_state(spark, st).localCheckpoint()
    read_wall = round(time.perf_counter() - t0, 2)
    exp = REGISTRY["dedup_paragraph_reconstruct"].fn(spark, DST)
    _assert_equal(got, exp, "fold16")
    return {"walls": walls, "read_wall": read_wall}


def run_semantic(spark, state_root: str, n_batches: int) -> dict:
    emb = spark.read.parquet(f"{DST}/embeddings.parquet") \
        .select("vec_id", "embedding")
    n = emb.count()
    k = max(SEM_K, -(-n // SEM_TARGET))  # the scaled (k ∝ n) contract
    st = os.path.join(state_root, "sem_state")
    t0 = time.perf_counter()
    init_semantic_state(emb, st, k=int(k), n_iter=SEM_ITER)
    init_wall = round(time.perf_counter() - t0, 2)
    print(f"  fold14 init (k={k}): {init_wall}s", flush=True)
    walls = []
    for i in range(n_batches):
        drain_cleaner(spark, wait_s=3.0)  # before the checkpoint (above)
        b = emb.filter(F.col("vec_id") % n_batches == i).localCheckpoint()
        t0 = time.perf_counter()
        fold_semantic_cells(b, st, batch_id=i)
        walls.append(round(time.perf_counter() - t0, 2))
        print(f"  fold14 batch {i}: {walls[-1]}s", flush=True)
    drain_cleaner(spark, wait_s=5.0)
    t0 = time.perf_counter()
    got = semantic_dedup_from_state(spark, st).localCheckpoint()
    read_wall = round(time.perf_counter() - t0, 2)
    exp = REGISTRY["dedup_semantic_cells_scaled"].fn(spark, DST)
    _assert_equal(got, exp, "fold14")
    return {"walls": walls, "init_wall": init_wall, "read_wall": read_wall}


def run_semantic_engine(spark, state_root: str, n_batches: int) -> dict:
    """Fold #14 driven by the REAL Structured Streaming engine
    (availableNow file source, maxFilesPerTrigger=1) at sf1.0* —
    closes the 'the fold curves bypass the engine' gap. The semantic
    fold is ingestion-ORDER-FREE (components/keepers recompute at
    read time), so exact stream≡batch equality is assertable no
    matter how the engine batches the files. Per-batch walls come
    from the query's own progress events (triggerExecution ms)."""
    from sparkstreamingproject_spark.sources.streams import file_stream
    from sparkstreamingproject_spark.streaming.semantic_maintain import (
        semantic_cells_stream)

    emb = spark.read.parquet(f"{DST}/embeddings.parquet") \
        .select("vec_id", "embedding")
    n = emb.count()
    k = max(SEM_K, -(-n // SEM_TARGET))
    land = os.path.join(state_root, "emb_land")
    emb.repartition(n_batches).write.parquet(land)
    st = os.path.join(state_root, "sem_engine_state")
    t0 = time.perf_counter()
    init_semantic_state(emb, st, k=int(k), n_iter=SEM_ITER)
    init_wall = round(time.perf_counter() - t0, 2)
    print(f"  fold14-engine init (k={k}): {init_wall}s", flush=True)
    drain_cleaner(spark, wait_s=5.0)
    t0 = time.perf_counter()
    q = semantic_cells_stream(
        file_stream(spark, land, emb.schema, max_files_per_trigger=1),
        st, os.path.join(state_root, "ck_sem_engine"))
    assert q.awaitTermination(1800), "availableNow stream must terminate"
    total_wall = round(time.perf_counter() - t0, 2)
    progress = [p if isinstance(p, dict) else json.loads(p.json)
                for p in q.recentProgress]
    walls = [round(p["durationMs"]["triggerExecution"] / 1000.0, 2)
             for p in progress if p.get("numInputRows", 0) > 0]
    for i, w in enumerate(walls):
        print(f"  fold14-engine batch {i}: {w}s", flush=True)
    drain_cleaner(spark, wait_s=5.0)
    t0 = time.perf_counter()
    got = semantic_dedup_from_state(spark, st).localCheckpoint()
    read_wall = round(time.perf_counter() - t0, 2)
    exp = REGISTRY["dedup_semantic_cells_scaled"].fn(spark, DST)
    _assert_equal(got, exp, "fold14-engine")
    return {"walls": walls, "init_wall": init_wall,
            "total_wall": total_wall, "read_wall": read_wall}


def main() -> None:
    import tempfile
    n_batches = 10
    if "--batches" in sys.argv:
        idx = sys.argv.index("--batches") + 1
        if idx >= len(sys.argv):
            sys.exit("--batches requires a value")
        n_batches = int(sys.argv[idx])
    if n_batches < 1:
        sys.exit("--batches must be >= 1")
    spark = get_spark("fold-scale-bench")
    build_sf1(spark)
    spark.read.parquet(f"{DST}/documents.parquet").count()  # warm JVM

    results = {}
    with tempfile.TemporaryDirectory(prefix="fold_scale_") as root:
        results["fold16_paragraph"] = run_paragraph(spark, root, n_batches)
        drain_cleaner(spark, wait_s=10.0)
        results["fold14_semantic"] = run_semantic(spark, root, n_batches)
        drain_cleaner(spark, wait_s=10.0)
        results["fold14_semantic_engine"] = run_semantic_engine(
            spark, root, n_batches)

    lines = ["| fold | batches | first | median | last | last/median "
             "| read-time | stream≡batch |",
             "|---|---|---|---|---|---|---|---|"]
    # raw JSON first: the summary below indexes walls[0]/median, which
    # would crash on an empty list (e.g. an engine run whose progress
    # events all report numInputRows == 0) AFTER the expensive bench
    # already ran (ADVICE r14 item 2)
    print(json.dumps({"fold_scale": results}))
    for name, r in results.items():
        w = r["walls"]
        if not w:
            lines.append(f"| {name} | 0 (no data-bearing triggers) "
                         "| — | — | — | — | — | — |")
            continue
        med = statistics.median(w)
        lines.append(
            f"| {name} | {len(w)}×sf1.0*/{len(w)} | {w[0]} s | {med} s "
            f"| {w[-1]} s | {round(w[-1] / med, 2)}× | {r['read_wall']} s "
            f"| ✔ (exceptAll 0/0) |")
    block = "\n".join(lines)
    print(block)

    path = os.path.join(ROOT, "SCALE.md")
    start, end = "<!-- scale:folds -->", "<!-- /scale:folds -->"
    with open(path) as f:
        body = f.read()
    if start in body:
        pre, rest = body.split(start, 1)
        _, post = rest.split(end, 1)
        body = pre + start + "\n" + block + "\n" + end + post
        with open(path, "w") as f:
            f.write(body)
        print(f"patched {path}")
    else:
        print("SCALE.md has no scale:folds markers — add them and paste "
              "the table")
    spark.stop()


if __name__ == "__main__":
    main()
