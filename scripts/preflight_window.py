"""Pre-flight the driver-correctness window at an arbitrary SF.

Replicates the driver's t2 gate (DuckDB-oracle hash compare, via
tests/oracle_harness.compare) over the first N registry entries — the
exact window the driver will check — at the given sf directory.
VERDICT r04 §next 3 asks for this at sf0.001/0.01/0.1 under
TZ=America/New_York before every round's driver run.

Usage:
    TZ=America/New_York python scripts/preflight_window.py /root/testdata/sf0.01 [N] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from sparkstreamingproject_spark.queries import REGISTRY  # noqa: E402
from sparkstreamingproject_spark.session import get_spark  # noqa: E402
from oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    if len(rest) == 1 and rest[0].isdigit():
        names = list(REGISTRY)[:int(rest[0])]
    elif rest:
        unknown = [n for n in rest if n not in REGISTRY]
        if unknown:
            print(f"unknown queries (skipped): {unknown}")
        names = [n for n in rest if n in REGISTRY]
    else:
        names = list(REGISTRY)[:50]
    spark = get_spark("preflight", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    failed = []
    for i, name in enumerate(names):
        spec = REGISTRY[name]
        if spec.oracle is None:
            rows = spec.fn(spark, sf_dir).count()
            print(f"[{i+1:3}/{len(names)}] {name}: no-oracle, {rows} rows")
            continue
        t0 = time.time()
        try:
            ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"[{i+1:3}/{len(names)}] {name}: {'PASS' if ok else 'FAIL'} "
              f"({dt:.1f}s) {'' if ok else msg}", flush=True)
        if not ok:
            failed.append((name, msg))
    print(f"\n{len(names) - len(failed)}/{len(names)} pass at {sf_dir}")
    for name, msg in failed:
        print(f"FAIL {name}: {msg[:500]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
