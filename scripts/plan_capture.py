"""Capture .explain("formatted") for a set of registered queries.

Round-15 optimization deliverable: plans/r15/<query>_<tag>.txt for
every query the round touches (the judge checks plan claims against
these files). Usage:

    python scripts/plan_capture.py <tag> [query ...]

With no query args, captures the full headline + sidecar sets.
NOTE: queries whose construction is iterative (Lloyd chains,
connected components, k-core rounds) EXECUTE their iterations during
construction — the captured plan is the final stage's plan, which is
still where the exchanges/joins under audit live.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(ROOT, "plans",
                       os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench
        names = list(bench.HEADLINE) + list(bench.SIDECAR)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    for name in names:
        fn = REGISTRY[name].fn
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # pragma: no cover
            print(f"FAILED {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
