"""Round-11 LLM wave: SemDeDup-style semantic (embedding-cluster)
dedup — the one well-known LLM-pipeline dedup family not previously
expressible as a single registered query (VERDICT r10 §missing 2).

Pipeline (Abbas et al., "SemDeDup", 2023): k-means cells over the
embedding space → cosine near-dup pairs INSIDE each cell only → one
keeper per connected component. The cells bound the pairwise quadratic
the way LSH bands bound shingle comparisons: k cells turn an O(n²)
global pass into k independent O((n/k)²) cell passes, each a plain
cell-keyed self-join that AQE sizes (and skew-splits) at runtime.

The oracle unrolls the identical deterministic pipeline in DuckDB —
Lloyd iterations as CTE pairs (the ``sim_ivf_kmeans_cells`` pattern),
per-cell pair generation, recursive-CTE min-label components — so
cell assignment, candidate scoping, AND the keep decision are all
hash-verified, not just the final counts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table

# SemDeDup parameters: 8 Lloyd-refined cells (2 iterations, the same
# deterministic first-k init as sim_ivf_kmeans_cells) and the corpus's
# established near-dup threshold (dedup_embedding_cosine pins 0.3 for
# the synthetic fixture embeddings; production corpora run ~0.95+).
SEM_K = 8
SEM_ITER = 2
SEM_THRESHOLD = 0.3


def _semantic_cells_oracle(k: int = SEM_K, n_iter: int = SEM_ITER,
                           threshold: float = SEM_THRESHOLD) -> str:
    """Unrolled Lloyd's + per-cell pairs + recursive components.
    Same 6dp centroid rounding / 6dp-sim/cell-id tie-break as the Spark
    kmeans (llm/similarity.py), same 4dp pair rounding as the near-dup
    kernels, so every stage is engine-independent."""
    def assign(cn: str, an: str) -> str:
        return f"""
    {an} AS (
      SELECT vec_id, v, cell FROM (
        SELECT p.vec_id, p.v, c.cell,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY round(list_cosine_similarity(p.v, c.cv), 6) DESC,
                          c.cell) AS rn
        FROM pts p CROSS JOIN {cn} c) WHERE rn = 1)"""

    def means(an: str, cn: str) -> str:
        return f"""
    {cn} AS (
      SELECT cell, list(round(m, 6) ORDER BY pos) AS cv FROM (
        SELECT cell, pos, avg(val) AS m FROM (
          SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS pos
          FROM {an})
        GROUP BY cell, pos)
      GROUP BY cell)"""

    steps = []
    prev = "c0"
    for i in range(1, n_iter + 1):
        steps.append(assign(prev, f"a{i}"))
        steps.append(means(f"a{i}", f"c{i}"))
        prev = f"c{i}"
    chain = ",".join(steps)
    return f"""
    WITH RECURSIVE pts AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (
      SELECT vec_id AS cell,
             list_transform(v, x -> round(x, 6)) AS cv
      FROM pts WHERE vec_id < {k}),
    {chain},
    final AS (
      SELECT vec_id, v, cell, sim AS centroid_sim FROM (
        SELECT p.vec_id, p.v, c.cell,
               round(list_cosine_similarity(p.v, c.cv), 6) AS sim,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY round(list_cosine_similarity(p.v, c.cv), 6) DESC,
                          c.cell) AS rn
        FROM pts p CROSS JOIN {prev} c) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM final a JOIN final b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {threshold}),
    e AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    walk(u, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.v, walk.label FROM walk JOIN e ON e.u = walk.u),
    comp AS (SELECT u, min(label) AS component FROM walk GROUP BY u),
    lab AS (
      SELECT f.vec_id, f.cell,
             coalesce(c.component, f.vec_id) AS component,
             f.centroid_sim
      FROM final f LEFT JOIN comp c ON c.u = f.vec_id)
    SELECT vec_id, cell, component, centroid_sim,
           CAST(row_number() OVER (PARTITION BY component
                                   ORDER BY centroid_sim ASC, vec_id) = 1
                AS BOOLEAN) AS is_kept
    FROM lab
    """


def semantic_cell_pairs(assigned, threshold: float = SEM_THRESHOLD):
    """Per-cell cosine near-dup pairs over a (vec_id, v, cell) relation
    — the SemDeDup candidate stage. A cell-keyed self-join: Spark
    shuffles both sides on ``cell`` (never a cartesian), so the
    quadratic is bounded by the largest cell, which at production k is
    held near n/k by the Lloyd refinement (and skew-split by AQE when
    it isn't). 4dp rounding before the threshold, like every cosine
    kernel in llm/similarity.py."""
    from ..llm.similarity import cosine_similarity
    a = assigned.select(F.col("vec_id").alias("id_a"),
                        F.col("v").alias("va"), "cell")
    b = assigned.select(F.col("vec_id").alias("id_b"),
                        F.col("v").alias("vb"), "cell")
    return (a.join(b, "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(cosine_similarity("va", "vb"), 4)
                    .alias("cosine"))
            .filter(F.col("cosine") >= threshold))


@register(
    "dedup_semantic_cells",
    oracle=_semantic_cells_oracle(),
    tags=("llm", "dedup", "similarity"),
)
def dedup_semantic_cells(spark, sf_dir):
    """SemDeDup semantic dedup: k-means cells → per-cell cosine
    near-dup pairs → keep-one-per-component, where the keeper is the
    member FARTHEST from its cell centroid (the paper's keep rule —
    it preserves the cluster's most distinctive example; ties to the
    smallest vec_id). Docs with no near-dup are their own component
    and are kept.

    This is the scale path for embedding-level dedup: the global
    near-dup pass (``dedup_embedding_cosine``) touches n² pair space;
    here cells bound the quadratic to Σ|cell|² with one cell-keyed
    self-join. Recall envelope: pairs whose members land in DIFFERENT
    cells are missed by design — tests/test_llm.py pins that the
    within-cell recall is exactly 1 and the miss set is exactly the
    cross-cell pairs (SemDeDup's documented trade; production raises
    k and accepts it, or double-assigns boundary points).

    Scale shape: centroids are k rows (broadcast); assignment is one
    corpus scan per Lloyd iteration; the pair stage shuffles on cell;
    components run on the (tiny) near-dup edge set only.
    """
    from ..llm.similarity import (cosine_similarity, kmeans_assign,
                                  kmeans_centroids)
    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    cents = kmeans_centroids(emb, k=SEM_K, n_iter=SEM_ITER)
    assigned = kmeans_assign(pts, cents)
    csim = (assigned.join(F.broadcast(cents), "cell")
            .select("vec_id", "v", "cell",
                    F.round(cosine_similarity("v", "cv"), 6)
                    .alias("centroid_sim")))
    # one lineage cut: csim feeds BOTH the pair stage (whose component
    # loop materializes it via connected_components' localCheckpoint)
    # and the final labeling scan — without the cut the 2-iteration
    # Lloyd chain re-executes per branch (measured ~1.7× the kernel
    # wall at sf0.1)
    csim = csim.localCheckpoint()
    pairs = semantic_cell_pairs(csim.select("vec_id", "v", "cell"))
    cc = D.connected_components(pairs)
    labeled = (csim
               .join(cc.withColumnRenamed("u", "vec_id"), "vec_id", "left")
               .withColumn("component",
                           F.coalesce("label", "vec_id")))
    rn = F.row_number().over(
        Window.partitionBy("component")
        .orderBy(F.asc("centroid_sim"), "vec_id"))
    return (labeled.withColumn("rn", rn)
            .select("vec_id", "cell", "component", "centroid_sim",
                    (F.col("rn") == 1).alias("is_kept")))
