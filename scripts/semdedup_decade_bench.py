"""Push the k ∝ n SemDeDup rows one scale decade further (VERDICT r14
§next 5): at sf1.0* the `_scaled` variants read ~linear (4.0x / 9.2x
for 10x data) but fixed overheads (Lloyd chain, session barriers)
still mask the pair stage. A 30x key-disjoint embedding replication
(sf3.0*) triples the sf1.0* volume; if the k ∝ n contract holds
(Σ|cell|² ≈ 50n), the 1.0*→3.0* wall ratio should read ≤ ~3.5x.

Uses scale_bench.replicate_embeddings (same sign-flip isometry
construction), so per-replica near-dup structure is bit-preserved and
cross-replica cosines decorrelate — output-row growth is linear by
construction and the measured ratio is ENGINE cost.

Usage:  python scripts/semdedup_decade_bench.py [--rebuild]
Prints per-kernel walls and 1.0*→3.0* ratios (merge into SCALE.md's
§semdedup-decade block by hand).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.session import drain_cleaner, get_spark  # noqa: E402
from scale_bench import DST as SF1_DST  # noqa: E402
from scale_bench import replicate_embeddings  # noqa: E402

SF3_DST = os.path.join(ROOT, ".scale", "sf3.0")

KERNELS = ["dedup_semantic_cells_scaled", "dedup_semantic_multiprobe_scaled"]

SFS = [("1.0*", SF1_DST, 10), ("3.0*", SF3_DST, 30)]


def main() -> None:
    spark = get_spark("semdedup-decade-bench")
    rebuild = "--rebuild" in sys.argv
    for _, dst, replicas in SFS:
        replicate_embeddings(spark, dst, replicas, rebuild=rebuild)
    spark.read.parquet(f"{SF1_DST}/embeddings.parquet").count()  # warm

    results: dict[str, dict[str, float]] = {k: {} for k in KERNELS}
    for label, sf_dir, _ in SFS:
        for name in KERNELS:
            drain_cleaner(spark, wait_s=10.0)
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            results[name][label] = dt
            print(f"  {name} @ sf{label}: {dt}s ({n} rows)", flush=True)

    lines = ["| kernel | sf1.0* | sf3.0* | 1.0→3.0 ratio (3x data) |",
             "|---|---|---|---|"]
    for name in KERNELS:
        r = results[name]
        ratio = round(r["3.0*"] / r["1.0*"], 1) if r["1.0*"] else float("inf")
        lines.append(f"| {name} | {r['1.0*']} s | {r['3.0*']} s "
                     f"| {ratio}x |")
    print("\n".join(lines))
    print(json.dumps({"semdedup_decade": results}))
    spark.stop()


if __name__ == "__main__":
    main()
