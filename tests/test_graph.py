"""Graph operator behavior tests (oracle parity covers the registry
query; these pin operator semantics on known graphs)."""

from __future__ import annotations

from sparkstreamingproject_spark.operators.graph import pagerank


def test_pagerank_star_graph_ranks_hub_highest(spark):
    """Spokes → hub: the hub must outrank every spoke, spokes tie."""
    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(4)], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=15).collect()}
    assert got["hub"] == max(got.values())
    spoke_ranks = {v for k, v in got.items() if k != "hub"}
    assert len(spoke_ranks) == 1
    # dangling hub leaks mass (documented simplification): total ≤ 1
    assert 0 < sum(got.values()) <= 1.000001


def test_pagerank_cycle_is_uniform(spark):
    """A directed cycle is perfectly symmetric — every node ties at
    1/n regardless of iteration count."""
    nodes = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(nodes[i], nodes[(i + 1) % 4]) for i in range(4)],
        "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=7).collect()}
    assert set(got.values()) == {0.25}


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, n_iter=3).count() == 0
