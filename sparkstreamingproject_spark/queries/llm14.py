"""Round-10 LLM wave: LSH-Ensemble size-partitioned containment index
(VERDICT r09 §next 3 — the one scoped-but-deferred r9 item).

The oracle replicates the exact deterministic pipeline (md5-slice
MinHash, bit-width size partitions, gap-bounded probing, stop-bucket
cap, exact verify) so DuckDB certifies candidate generation AND
verification, not just the final containment arithmetic.
"""

from __future__ import annotations

from ..llm import dedup as D
from .base import register, table
from .llm import SHINGLES_CTE

# one min-agg per hash, generated from the same constants as Spark
_LSHE_MINS = ",\n           ".join(
    f"min({D.minhash_hex_sql(j)}) AS h{j}" for j in range(D.LSHE_N_HASHES))
_LSHE_HLIST = "[" + ", ".join(f"h{j}" for j in range(D.LSHE_N_HASHES)) + "]"


@register(
    "dedup_containment_lsh_ensemble",
    oracle=f"""
    WITH {SHINGLES_CTE.strip().rstrip(',')},
    sh AS MATERIALIZED (SELECT doc_id, shingle FROM shingles),
    sig AS MATERIALIZED (
      SELECT doc_id, count(*) AS c,
           {_LSHE_MINS}
      FROM sh GROUP BY doc_id),
    part AS (
      SELECT *, CAST(length(to_base(c, 2)) - 1 AS INT) AS p FROM sig),
    k AS MATERIALIZED (
      SELECT doc_id, j.j AS j, {_LSHE_HLIST}[j.j + 1] AS h,
             p + s.s AS q
      FROM part
      CROSS JOIN (SELECT unnest(range(0, {D.LSHE_N_HASHES})) AS j) j
      CROSS JOIN (SELECT unnest(range(0, {D.LSHE_MAX_GAP + 1})) AS s) s),
    cap AS (
      SELECT j, h, q FROM k GROUP BY 1, 2, 3
      HAVING count(*) BETWEEN 2 AND {D.LSHE_BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a
      JOIN cap c ON c.j = a.j AND c.h = a.h AND c.q = a.q
      JOIN k b ON b.j = a.j AND b.h = a.h AND b.q = a.q
             AND a.doc_id < b.doc_id),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT cd.id_a, cd.id_b, count(*) AS i
      FROM cand cd
      JOIN sh a ON a.doc_id = cd.id_a
      JOIN sh b ON b.doc_id = cd.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i * 1.0 / least(ca.c, cb.c), 6) AS containment
    FROM inter
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
    WHERE round(i * 1.0 / least(ca.c, cb.c), 6) >= 0.9
    """,
    tags=("llm", "dedup"),
)
def dedup_containment_lsh_ensemble(spark, sf_dir):
    """Near-subset dedup at corpus scale via LSH-Ensemble
    (llm/dedup.py:lsh_ensemble_containment_pairs): docs are
    size-partitioned geometrically, each partition carries its own
    MinHash-LSH bucket space, and a doc probes its own plus the next
    max_gap partitions — so containment candidates are found without
    the posting-list cap that makes ``dedup_containment`` drop true
    subset pairs behind hot shingles. Candidates verify EXACTLY (full
    shingle intersection, keyed joins only), so output precision is 1
    and recall follows the documented S-curve envelope (≥0.84 up to a
    16× size ratio at t=0.9 with 32 hashes; every pair up to 16× is
    partition-covered)."""
    return D.lsh_ensemble_containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.9)
