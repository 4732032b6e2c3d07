"""Round-15 optimization equivalence tests.

Each r15 rewrite changed an operator's INTERNALS while contracting to
identical results — these tests pin the equivalences directly (the
oracle parity suite checks end results; these check the specific
rewritten kernel against its pre-r15 formulation on hostile inputs,
including ties and degenerate shapes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

pytestmark = pytest.mark.smoke


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# --------------------------------------------------------- argmax_cell


def test_argmax_cell_equals_window_argmax(spark):
    """The decimal-encoded hash-aggregate argmax (llm/similarity.py:
    argmax_cell) must pick exactly row_number()==1 over
    (sim DESC, cell ASC) — including 6dp sim TIES, negative sims, and
    large cell ids (the 10^19 radix contract)."""
    from sparkstreamingproject_spark.llm.similarity import argmax_cell
    rows = [
        # vec 1: plain winner
        (1, 0, 0.5), (1, 1, 0.25),
        # vec 2: exact tie on sim -> smallest cell must win
        (2, 7, 0.111111), (2, 3, 0.111111), (2, 9, -0.2),
        # vec 3: all-negative sims
        (3, 2, -0.995), (3, 5, -0.000001),
        # vec 4: huge cell ids (long range)
        (4, 9_123_456_789_012, 0.75), (4, 8_999_999_999_999, 0.75),
        # vec 5: sim exactly 1.0 and 0.0
        (5, 4, 1.0), (5, 6, 0.0),
    ]
    scored = spark.createDataFrame(rows, "vec_id long, cell long, sim double")
    got = argmax_cell(scored, "vec_id", keep_sim=True)
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cell")
    want = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("vec_id", "cell", "sim"))
    assert _rows(got, ["vec_id", "cell", "sim"]) == \
        _rows(want, ["vec_id", "cell", "sim"])


def test_kmeans_assign_keep_sim_matches_centroid_rejoin(spark):
    """keep_sim's aggregated winner similarity must equal the value the
    pre-r15 code recomputed by re-joining centroids and re-scoring."""
    from sparkstreamingproject_spark.llm.similarity import (
        cosine_similarity, kmeans_assign)
    import random
    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, v array<double>")
    cents = spark.createDataFrame(
        [(c, [rng.uniform(-1, 1) for _ in range(8)]) for c in range(5)],
        "cell long, cv array<double>")
    got = kmeans_assign(pts, cents, keep_sim=True)
    rejoin = (kmeans_assign(pts, cents)
              .join(F.broadcast(cents), "cell")
              .select("vec_id", "cell",
                      F.round(cosine_similarity("v", "cv"), 6)
                      .alias("sim")))
    assert _rows(got, ["vec_id", "cell", "sim"]) == \
        _rows(rejoin, ["vec_id", "cell", "sim"])


# ------------------------------------------------- salted pair joins


def test_semantic_cell_pairs_salted_equals_unsalted(spark):
    """The (cell, salt) split must emit exactly the unsalted pair set —
    every (a < b) same-cell pair once, for any salt factor (the b-side
    replication guarantees each pair meets in a's bucket)."""
    from sparkstreamingproject_spark.queries.llm15 import (
        _pair_salt, semantic_cell_pairs)
    import random
    rng = random.Random(11)
    assigned = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)], i % 3)
         for i in range(60)],
        "vec_id long, v array<double>, cell long")
    unsalted = semantic_cell_pairs(assigned, threshold=-1.0, n_keys=None)
    # n_keys=1 forces the max salt the session allows
    salted = semantic_cell_pairs(assigned, threshold=-1.0, n_keys=1)
    assert _pair_salt(assigned, 1) > 1  # the salted path actually ran
    cols = ["id_a", "id_b", "cosine"]
    assert _rows(salted, cols) == _rows(unsalted, cols)


# -------------------------------------------- connected components


def test_connected_components_sum_convergence(spark):
    """The Σlabel convergence check must reach the same fixpoint labels
    as a reference union-find, including a graph that converges in one
    round (star) and a long chain (many rounds)."""
    from sparkstreamingproject_spark.llm.dedup import connected_components
    # star centered at 0 (1 round) + chain 100..106 (several rounds) +
    # isolated pair
    edges = ([(0, i) for i in range(1, 6)]
             + [(i, i + 1) for i in range(100, 106)]
             + [(200, 201)])
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["u"], r["label"])
           for r in connected_components(df).collect()}
    # reference union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {(u, find(u)) for u in parent}
    assert got == want
