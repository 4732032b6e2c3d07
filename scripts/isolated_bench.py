"""Isolated min-of-3 timing of individual registered queries.

Replicates bench.py's SIDECAR protocol (ContextCleaner drain before
each timed rep, min-of-N kept) for ad-hoc before/after measurements
during optimization rounds — the numbers are comparable to the quiet
artifact's sidecar block, NOT to the headline block (which times
in-sequence, undrained, per the frozen r01 protocol).

Usage: python scripts/isolated_bench.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.session import drain_cleaner, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("isolated-bench")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # warm JVM

    def _warm(it):
        import numpy as _np
        _np.ones((8, 8)) @ _np.ones((8, 8))
        yield from it
    n_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (spark.range(n_cores * 4, numPartitions=n_cores * 4)
     .mapInPandas(_warm, "id long").count())

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        best = None
        for _ in range(REPEATS):
            drain_cleaner(spark, wait_s=5.0)
            spark.sparkContext.setJobDescription(f"isolated: {name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            t = round(time.perf_counter() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
        print(f"{best:8.3f}  {name}", flush=True)
    print(json.dumps({"isolated_min_of": REPEATS, "sf_dir": SF_DIR,
                      "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
