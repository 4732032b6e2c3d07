"""Prefix-filtered set-similarity join (operators/setsim.py): the
candidate pruning must be lossless — results equal the naive
all-pairs Jaccard on constructed fixtures."""

from __future__ import annotations

from itertools import combinations

from sparkstreamingproject_spark.operators.setsim import setsim_self_join


def _naive(sets: dict, t: float):
    out = set()
    for (ka, a), (kb, b) in combinations(sorted(sets.items()), 2):
        inter = len(a & b)
        if inter and inter / len(a | b) >= t:
            out.add((ka, kb))
    return out


def _spark_pairs(spark, sets: dict, pct: int):
    rows = [(k, i) for k, items in sets.items() for i in items]
    rel = spark.createDataFrame(rows, "k bigint, item bigint")
    got = setsim_self_join(rel, "k", "item", threshold_pct=pct).collect()
    return {(r["ka"], r["kb"]) for r in got}, got


def test_prefix_filter_is_lossless_on_overlapping_sets(spark):
    sets = {
        1: {1, 2, 3, 4},
        2: {1, 2, 3, 9},      # J(1,2) = 3/5 = 0.6
        3: {1, 2, 3, 4},      # J(1,3) = 1.0
        4: {7, 8},            # J with others = low
        5: {7, 8, 9},         # J(4,5) = 2/3
        6: {100},
        7: {100},             # J(6,7) = 1.0
    }
    got, rows = _spark_pairs(spark, sets, 50)
    assert got == _naive({k: set(v) for k, v in sets.items()}, 0.5)
    by_pair = {(r["ka"], r["kb"]): r for r in rows}
    assert by_pair[(1, 3)]["jac_bp"] == 10000
    assert by_pair[(1, 2)]["jac_bp"] == 6000
    assert by_pair[(4, 5)]["jac_bp"] == 6666  # truncating division


def test_duplicate_items_collapse_before_similarity(spark):
    rows = [(1, 5), (1, 5), (1, 6), (2, 5), (2, 6), (2, 6)]
    rel = spark.createDataFrame(rows, "k bigint, item bigint")
    got = setsim_self_join(rel, "k", "item", threshold_pct=50).collect()
    assert len(got) == 1
    assert got[0]["jac_bp"] == 10000 and got[0]["sa"] == 2


def test_threshold_100_keeps_only_identical_sets(spark):
    sets = {1: {1, 2, 3}, 2: {1, 2, 3}, 3: {1, 2, 4}}
    got, _ = _spark_pairs(spark, sets, 100)
    assert got == {(1, 2)}


def test_disjoint_sets_produce_no_candidates(spark):
    sets = {i: {i * 10, i * 10 + 1} for i in range(1, 8)}
    got, _ = _spark_pairs(spark, sets, 50)
    assert got == set()
