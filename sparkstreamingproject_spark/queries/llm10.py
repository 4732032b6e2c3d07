"""Round-7 continued unfreeze, waves 4-5: residual (two-level
additive) quantization — the RVQ family behind modern retrieval
indexes and neural audio codecs, completing the compressed-vector ANN
lineup beside PQ (`llm5.py`) and IVFADC: level 2 quantizes the
RESIDUAL of level 1 over the full vector, so error falls
multiplicatively while codes stay two small ints per vector — and the
Matryoshka prefix-dimension recall sweep (truncated-dimension scan +
full-dimension rerank, the other axis of vector compression).

Float discipline: the PQ recipe verbatim — elements quantized once to
BIGINT(round(x*1e6)); every distance, argmin, LUT entry, cross-term,
and ranking is exact integer; the only floats are terminal /1e12
divides rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.similarity import RQ_K1, RQ_K2, rq_adc_topk, rq_codebooks, rq_encode
from .base import register, table

_N_QUERIES = 8
_TOPK = 5

# shared oracle prelude: integer elements, level-1 codebook (first K1
# ids), level-1 assignment, residuals, level-2 codebook (residuals of
# the next K2 ids), level-2 assignment
_RQ_PRELUDE = f"""
    pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    el AS (SELECT vec_id, CAST(i AS INT) AS pos,
                  CAST(round(v[i] * 1000000) AS BIGINT) AS x
           FROM pts, unnest(range(1, len(v) + 1)) AS g(i)),
    cb1 AS (SELECT CAST(vec_id AS INT) AS code1, pos, x AS y
            FROM el WHERE vec_id < {RQ_K1}),
    d1 AS (SELECT e.vec_id, c.code1,
                  sum((e.x - c.y) * (e.x - c.y)) AS d
           FROM el e JOIN cb1 c USING (pos)
           GROUP BY 1, 2),
    a1 AS (SELECT vec_id, code1, CAST(d AS BIGINT) AS d1_int FROM (
             SELECT vec_id, code1, d,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d, code1) AS rn
             FROM d1) WHERE rn = 1),
    res AS (SELECT e.vec_id, e.pos, e.x - c.y AS r
            FROM el e JOIN a1 USING (vec_id)
            JOIN cb1 c ON c.code1 = a1.code1 AND c.pos = e.pos),
    cb2 AS (SELECT CAST(vec_id - {RQ_K1} AS INT) AS code2, pos, r AS z
            FROM res WHERE vec_id >= {RQ_K1}
                       AND vec_id < {RQ_K1 + RQ_K2}
            UNION ALL
            SELECT CAST({RQ_K2} AS INT) AS code2, pos,
                   CAST(0 AS BIGINT) AS z
            FROM (SELECT DISTINCT pos FROM el)),
    d2 AS (SELECT s.vec_id, c.code2,
                  sum((s.r - c.z) * (s.r - c.z)) AS d
           FROM res s JOIN cb2 c USING (pos)
           GROUP BY 1, 2),
    a2 AS (SELECT vec_id, code2, CAST(d AS BIGINT) AS recon_int FROM (
             SELECT vec_id, code2, d,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d, code2) AS rn
             FROM d2) WHERE rn = 1)
"""


@register(
    "embedding_rq_codebook",
    oracle=f"""
    WITH {_RQ_PRELUDE}
    SELECT a1.code1 AS c1,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(sum(CAST(a1.d1_int AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*) / 1e12, 6) AS avg_err_l1,
           round(CAST(sum(CAST(a2.recon_int AS DECIMAL(38,0))) AS DOUBLE)
                 / count(*) / 1e12, 6) AS avg_err_l2
    FROM a1 JOIN a2 USING (vec_id)
    GROUP BY 1
    """,
    tags=("llm", "similarity", "pq"),
)
def embedding_rq_codebook(spark, sf_dir):
    """RQ codebook population + per-coarse-cell reconstruction error
    at each level (llm/similarity.py:rq_codebooks/rq_encode): level 2
    quantizes level 1's residual, so avg_err_l2 <= avg_err_l1 in every
    cell — the additive-refinement property that lets RVQ stack levels
    until the error budget is met. Codebooks are k*d ints (always
    broadcast); encoding is two broadcast-join + per-id argmin passes,
    never vector x vector."""
    emb = table(spark, sf_dir, "embeddings")
    cb1, cb2 = rq_codebooks(emb)
    codes = rq_encode(emb, cb1, cb2)
    return (codes.groupBy(F.col("c1"))
            .agg(F.count("*").alias("n_vectors"),
                 F.round(F.sum(F.col("d1_int").cast("decimal(38,0)"))
                         .cast("double") / F.count("*") / F.lit(1e12), 6)
                 .alias("avg_err_l1"),
                 F.round(F.sum(F.col("recon_int").cast("decimal(38,0)"))
                         .cast("double") / F.count("*") / F.lit(1e12), 6)
                 .alias("avg_err_l2")))


@register(
    "sim_ann_rq_adc",
    oracle=f"""
    WITH {_RQ_PRELUDE},
    q AS (SELECT vec_id AS q_id, pos, x FROM el
          WHERE vec_id < {_N_QUERIES}),
    l1 AS (SELECT q.q_id, c.code1 AS c1,
                  CAST(sum((q.x - c.y) * (q.x - c.y)) AS BIGINT) AS t1
           FROM q JOIN cb1 c USING (pos)
           GROUP BY 1, 2),
    l2 AS (SELECT q.q_id, c.code2 AS c2,
                  CAST(sum(c.z * c.z - 2 * q.x * c.z) AS BIGINT) AS t2
           FROM q JOIN cb2 c USING (pos)
           GROUP BY 1, 2),
    x12 AS (SELECT a.code1 AS c1, b.code2 AS c2,
                   CAST(2 * sum(a.y * b.z) AS BIGINT) AS t12
            FROM cb1 a JOIN cb2 b USING (pos)
            GROUP BY 1, 2),
    tot AS (SELECT l1.q_id, a1.vec_id,
                   l1.t1 + l2.t2 + x12.t12 AS rq_int
            FROM a1 JOIN a2 USING (vec_id)
            JOIN x12 ON x12.c1 = a1.code1 AND x12.c2 = a2.code2
            JOIN l1 ON l1.c1 = a1.code1
            JOIN l2 ON l2.c2 = a2.code2 AND l2.q_id = l1.q_id
            WHERE l1.q_id <> a1.vec_id)
    SELECT q_id, vec_id,
           round(CAST(rq_int AS DOUBLE) / 1e12, 6) AS rq_dist,
           CAST(rank AS INT) AS rank
    FROM (SELECT q_id, vec_id, rq_int,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rq_int, vec_id) AS rank
          FROM tot)
    WHERE rank <= {_TOPK}
    """,
    tags=("llm", "similarity", "pq"),
)
def sim_ann_rq_adc(spark, sf_dir):
    """Two-level ADC top-5 for 8 queries over RQ codes
    (llm/similarity.py:rq_adc_topk) via the exact decomposition
    ||q - c1 - c2||^2 = L1[c1] + (||c2||^2 - 2 q.c2) + 2 c1.c2:
    two per-query LUTs plus one query-independent k1 x k2 cross table,
    all broadcast — scoring touches only the two-int CODES relation
    (three lookups + one add per vector), the raw embeddings never
    enter the scan. Composes with ivf_assign at 100 TB exactly like
    the PQ ADC kernel."""
    emb = table(spark, sf_dir, "embeddings")
    cb1, cb2 = rq_codebooks(emb)
    codes = rq_encode(emb, cb1, cb2)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return rq_adc_topk(codes, cb1, cb2, queries, k=_TOPK)


# ---------------------------------------- prefix-dimension retrieval

_MP_K = 10          # recall@K
_MP_MOD = 499       # fixed query subset: vec_id % 499 == 0
_MP_DIMS = (8, 16, 32)   # prefix lengths swept (full vector = 64)
_MP_SHORTLIST = 40  # rerank shortlist per query


def _mp_arm_sql(d: int) -> str:
    return f"""
      CAST(list_sum(list_transform(range(1, {d + 1}),
           i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT)
        AS d{d}"""


@register(
    "sim_ann_dim_prefix_recall",
    oracle=f"""
    WITH b AS (SELECT vec_id,
                      list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> CAST(round(x * 1000000)
                                               AS BIGINT)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, v FROM b
          WHERE vec_id % {_MP_MOD} = 0),
    nq AS (SELECT count(*) AS n_queries FROM q),
    pairs AS (
      SELECT q.q_id, c.vec_id AS cand_id,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])))
                  AS BIGINT) AS dfull,
             {", ".join(_mp_arm_sql(d) for d in _MP_DIMS)}
      FROM q JOIN b c ON c.vec_id != q.q_id),
    ranked AS (
      SELECT q_id, cand_id, dfull,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dfull, cand_id) AS r_full,
             {", ".join(
        f'''row_number() OVER (PARTITION BY q_id
                                ORDER BY d{d}, cand_id) AS r{d}'''
        for d in _MP_DIMS)}
      FROM pairs),
    rr AS (
      SELECT q_id, cand_id, r_full,
             {", ".join(f"r{d}" for d in _MP_DIMS)},
             {", ".join(
        f'''row_number() OVER (PARTITION BY q_id
                ORDER BY CASE WHEN r{d} <= {_MP_SHORTLIST}
                              THEN 0 ELSE 1 END,
                         dfull, cand_id) AS rr{d}'''
        for d in _MP_DIMS)}
      FROM ranked),
    agg AS (
      SELECT
        {", ".join(
        f'''CAST(sum(CASE WHEN r_full <= {_MP_K} AND r{d} <= {_MP_K}
                          THEN 1 ELSE 0 END) AS BIGINT) AS hd{d},
            CAST(sum(CASE WHEN r_full <= {_MP_K} AND rr{d} <= {_MP_K}
                          THEN 1 ELSE 0 END) AS BIGINT) AS hr{d}'''
        for d in _MP_DIMS)}
      FROM rr),
    arms AS (
      {" UNION ALL ".join(
        f'''SELECT CAST({d} AS INT) AS prefix_dim,
                   hd{d} AS hits_direct, hr{d} AS hits_rerank
            FROM agg'''
        for d in _MP_DIMS)})
    SELECT prefix_dim, nq.n_queries, hits_direct,
           round(hits_direct * 1.0 / (nq.n_queries * {_MP_K}), 6)
             AS recall_direct,
           hits_rerank,
           round(hits_rerank * 1.0 / (nq.n_queries * {_MP_K}), 6)
             AS recall_rerank
    FROM arms CROSS JOIN nq
    """,
    tags=("llm", "similarity", "eval"),
)
def sim_ann_dim_prefix_recall(spark, sf_dir):
    """Matryoshka-style prefix-dimension retrieval sweep (the
    multi-arm + two-stage generalization of the single-arm
    `sim_matryoshka_eval`, which measures one 16-dim prefix with no
    rerank): recall@10 vs
    full-dimension exact ground truth when candidates are scored on
    only the FIRST d' of 64 dims (d' in {8, 16, 32}), both directly
    and with the production two-stage shape — prefix-dim shortlist of
    40, then full-dim rerank of the shortlist. This is the tuning
    curve for dimension-truncated indexes (MRL embeddings / scalar
    columnar vector layouts): a d'=8 scan reads 8x fewer bytes, and
    the sweep shows how much of that loss the rerank stage buys back.

    One |q| x N pair relation carries ALL arm distances as separate
    columns; every window partitions by q_id, so Catalyst plans ONE
    shuffle and seven sorts over the same exchange — the arms never
    rescan the corpus. Rerank ranking sorts shortlist membership
    first, then full distance, so rr <= 10 implies shortlist
    membership (40 >= 10) without a second pass. All distances exact
    BIGINT (elements pre-quantized x1e6); the two recalls are terminal
    rounded divisions."""
    from pyspark.sql import Window

    from ..llm.similarity import _int_vec, _sq_l2_int

    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _int_vec("embedding").alias("v"))
    q = (v.filter(F.col("vec_id") % _MP_MOD == 0)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv")))
    nq = q.agg(F.count("*").alias("n_queries"))

    pairs = (v.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id").alias("cand_id"),
                     _sq_l2_int(F.col("qv"), F.col("v")).alias("dfull"),
                     *[_sq_l2_int(F.slice("qv", 1, d), F.slice("v", 1, d))
                       .alias(f"d{d}") for d in _MP_DIMS]))

    def wq(*cols):
        return Window.partitionBy("q_id").orderBy(*cols)

    ranked = pairs.select(
        "q_id", "cand_id", "dfull",
        F.row_number().over(wq("dfull", "cand_id")).alias("r_full"),
        *[F.row_number().over(wq(f"d{d}", "cand_id")).alias(f"r{d}")
          for d in _MP_DIMS])
    rr = ranked.select(
        "r_full", *[f"r{d}" for d in _MP_DIMS],
        *[F.row_number().over(
            wq(F.when(F.col(f"r{d}") <= _MP_SHORTLIST, 0).otherwise(1),
               "dfull", "cand_id")).alias(f"rr{d}")
          for d in _MP_DIMS])

    gt = F.col("r_full") <= _MP_K
    agg = rr.agg(*[a for d in _MP_DIMS for a in (
        F.sum(F.when(gt & (F.col(f"r{d}") <= _MP_K), 1).otherwise(0))
        .cast("long").alias(f"hd{d}"),
        F.sum(F.when(gt & (F.col(f"rr{d}") <= _MP_K), 1).otherwise(0))
        .cast("long").alias(f"hr{d}"))])

    # explode ONE aggregate row into arm rows — a union of per-arm
    # selects re-derives the whole pair relation per arm (three q_id
    # exchanges instead of one; pinned by test_plans)
    arms = (agg.select(F.explode(F.array(*[
        F.struct(F.lit(d).cast("int").alias("prefix_dim"),
                 F.col(f"hd{d}").alias("hits_direct"),
                 F.col(f"hr{d}").alias("hits_rerank"))
        for d in _MP_DIMS])).alias("a"))
        .select("a.*"))
    return (arms.crossJoin(F.broadcast(nq))
            .select("prefix_dim", "n_queries", "hits_direct",
                    F.round(F.col("hits_direct")
                            / (F.col("n_queries") * _MP_K), 6)
                    .alias("recall_direct"),
                    "hits_rerank",
                    F.round(F.col("hits_rerank")
                            / (F.col("n_queries") * _MP_K), 6)
                    .alias("recall_rerank")))
