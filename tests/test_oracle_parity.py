"""Every registered query must match its DuckDB oracle (the driver's
t2 gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from sparkstreamingproject_spark.queries import REGISTRY

from .oracle_harness import compare

CASES = [(n, s) for n, s in REGISTRY.items() if s.oracle is not None]

# inner-loop scoping (VERDICT r07 §next 6): the first-50 registry
# entries ARE the driver's correctness window — they run in every
# inner loop; the long tail (already driver-certified in earlier
# rounds) is marked slow and runs at round close with the full suite.
_WINDOW = set(list(REGISTRY)[:50])
_PARAMS = [n if n in _WINDOW else pytest.param(n, marks=pytest.mark.slow)
           for n, _ in CASES]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.slow
def test_every_query_has_rows_or_is_known_empty(spark, sf_dir):
    # queries are allowed to be empty only when the data genuinely has
    # no qualifying rows; flag accidental empties early
    allowed_empty = {"join_left_null_branch", "join_anti", "dedup_minhash_lsh",
                     "dedup_ngram_jaccard", "dedup_embedding_cosine",
                     # at sf0.001 every above-average-balance customer
                     # happens to have orders; non-empty from sf0.01 up
                     "q22_idle_rich_customers"}
    for name, spec in REGISTRY.items():
        n = spec.fn(spark, sf_dir).count()
        if name not in allowed_empty:
            assert n > 0, f"{name} returned 0 rows"
