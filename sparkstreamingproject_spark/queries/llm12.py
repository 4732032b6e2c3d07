"""Round-8 additions, wave 2: blocking-quality evaluation — the
methodology metric every entity-resolution / near-dedup pipeline needs
before trusting its blocker at scale.

A blocker (here: the registry's MinHash-LSH banding) is judged on two
axes: PAIRS COMPLETENESS (what fraction of truly-similar pairs does it
surface — recall of the candidate set) and REDUCTION RATIO (what
fraction of the all-pairs quadratic did it avoid). Ground truth is the
capped exact n-gram Jaccard at a LOWER threshold (0.5) than the dedup
gate, so the metric sees the borderline pairs where blockers actually
fail. All counts are exact integers; the two ratios are terminal
6dp rounds on identical integer inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table
from .llm import MINHASH_CTE, _BAND_SELECTS

_BQ_TAU = 0.5
_BQ_CAP = 50


@register(
    "er_blocking_quality",
    oracle=f"""
    WITH {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    capped AS (
      SELECT shingle FROM shingles GROUP BY shingle
      HAVING count(*) <= {_BQ_CAP}),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN capped USING (shingle)),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN counts ca ON ca.doc_id = id_a
      JOIN counts cb ON cb.doc_id = id_b
      WHERE round(i * 1.0 / (ca.c + cb.c - i), 6) >= {_BQ_TAU}),
    m AS (SELECT
            (SELECT count(*) FROM truth) AS n_truth,
            (SELECT count(*) FROM cands) AS n_candidates,
            (SELECT count(*) FROM truth t JOIN cands c
             ON c.id_a = t.id_a AND c.id_b = t.id_b) AS n_caught,
            (SELECT count(*) FROM documents) AS nd)
    SELECT n_truth, n_candidates, n_caught,
           CASE WHEN n_truth > 0
                THEN round(n_caught * 1.0 / n_truth, 6) END
             AS pairs_completeness,
           CAST(nd * (nd - 1) / 2 AS BIGINT) AS n_total_pairs,
           round(1.0 - n_candidates * 1.0 / (nd * (nd - 1) / 2), 6)
             AS reduction_ratio
    FROM m
    """,
    tags=("llm", "dedup", "er"),
)
def er_blocking_quality(spark, sf_dir):
    """Blocking-quality report of the MinHash-LSH blocker against
    capped exact-Jaccard ground truth at tau=0.5: pairs completeness
    (candidate-set recall over truly-similar pairs) and reduction
    ratio (fraction of the N(N-1)/2 all-pairs avoided) — the two
    numbers that decide whether a blocker is safe to deploy before
    any 100 TB run commits to it.

    Scale shape: candidates come from per-bucket posting lists (the
    registry's LSH path — never all-pairs); ground truth reuses the
    capped prefix-filtered Jaccard machinery, whose candidate volume
    is bounded by the stop-shingle cap. The truth∩candidates overlap
    is one keyed semi-join on (id_a, id_b); every metric is a 1-row
    aggregate crossJoined at the end. At corpus scale the ground
    truth would be estimated on a document SAMPLE (same query over a
    hash-bucketed slice) — the metric algebra is unchanged."""
    docs = table(spark, sf_dir, "documents")
    cands = D.lsh_candidate_pairs(docs)
    truth = D.jaccard_pairs(docs, threshold=_BQ_TAU,
                            max_postings=_BQ_CAP).select("id_a", "id_b")
    caught = truth.join(cands, ["id_a", "id_b"], "left_semi")
    m = (truth.agg(F.count("*").alias("n_truth"))
         .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
         .crossJoin(caught.agg(F.count("*").alias("n_caught")))
         .crossJoin(docs.agg(F.count("*").alias("nd"))))
    total = (F.col("nd") * (F.col("nd") - 1) / 2).cast("long")
    return m.select(
        "n_truth", "n_candidates", "n_caught",
        F.when(F.col("n_truth") > 0,
               F.round(F.col("n_caught") / F.col("n_truth"), 6))
        .alias("pairs_completeness"),
        total.alias("n_total_pairs"),
        F.round(F.lit(1.0) - F.col("n_candidates") / total, 6)
        .alias("reduction_ratio"))
