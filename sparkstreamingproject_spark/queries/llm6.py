"""Round-4 continuation, wave 19: dedup-quality evaluation harnesses —
the tuning tools a curation pipeline runs before committing to an index
configuration.

- `dedup_minhash_pr_sweep`: precision/recall of the MinHash-LSH
  candidate generator against exact n-gram Jaccard ground truth at a
  threshold sweep (the dedup sibling of `sim_recall_at_k_eval`).
- `dedup_semantic_lexical_pairs`: embedding-LSH candidate pairs scored
  by BOTH cosine and lexical Jaccard — the cross-modal verification
  view that separates paraphrases (high cosine, low Jaccard) from
  near-copies (high both).

Float discipline: every threshold decision is an integer
cross-multiplication (10·i ≥ t·union); cosine/Jaccard values are
rounded at fixed dp via the registry's established kernels; counts are
integers with NULL-guarded terminal ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import dedup as D
from ..llm import similarity as S
from .base import register, table
from .llm import MINHASH_CTE, SHINGLES_CTE, _BAND_SELECTS

_PR_CAP = 50          # stop-shingle cap (same default as dedup_ngram_jaccard)
_PR_TENTHS = (5, 7, 8)   # thresholds 0.5 / 0.7 / 0.8


@register(
    "dedup_minhash_pr_sweep",
    oracle=f"""
    WITH {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
    capped AS (
      SELECT shingle FROM shingles GROUP BY shingle
      HAVING count(*) <= {_PR_CAP}),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN capped USING (shingle)),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS i
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT i.id_a, i.id_b, i.i,
             ca.c + cb.c - i.i AS u
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b),
    th AS (SELECT unnest([{", ".join(str(t) for t in _PR_TENTHS)}]) AS tt),
    truth AS (
      SELECT th.tt, j.id_a, j.id_b
      FROM jac j, th WHERE 10 * j.i >= th.tt * j.u),
    nt AS (SELECT tt, CAST(count(*) AS BIGINT) AS n_truth
           FROM truth GROUP BY tt),
    tp AS (SELECT t.tt, CAST(count(*) AS BIGINT) AS tp
           FROM truth t JOIN cand c
             ON t.id_a = c.id_a AND t.id_b = c.id_b
           GROUP BY t.tt)
    SELECT round(th.tt / 10.0, 1) AS threshold,
           coalesce(nt.n_truth, 0) AS n_truth,
           nc.n_cand,
           coalesce(tp.tp, 0) AS n_tp,
           CASE WHEN nc.n_cand > 0
                THEN round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
                           / nc.n_cand, 6) END AS precision_at_t,
           CASE WHEN coalesce(nt.n_truth, 0) > 0
                THEN round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
                           / nt.n_truth, 6) END AS recall_at_t
    FROM th
    LEFT JOIN nt ON nt.tt = th.tt
    LEFT JOIN tp ON tp.tt = th.tt
    CROSS JOIN nc
    """,
    tags=("llm", "dedup", "eval"),
)
def dedup_minhash_pr_sweep(spark, sf_dir):
    """Precision/recall of MinHash-LSH candidate pairs against exact
    n-gram Jaccard ground truth at thresholds 0.5/0.7/0.8 — the
    measurement that tunes (bands, rows) before a corpus-scale dedup
    run. Ground truth is complete by construction: any pair with
    J ≥ 0.5 shares a shingle, so the posting-list pair generation
    (stop-shingle cap 50, the production default) enumerates every
    qualifying pair. Threshold membership is the integer
    cross-multiplication 10·i ≥ t·union — no float compare. Scale:
    truth costs one shingle self-pairing (capped), candidates one
    band join; both are the shapes the dedup family already runs."""
    docs = table(spark, sf_dir, "documents")
    sh0 = D.word_shingles(docs)
    capped = (sh0.groupBy("shingle").agg(F.count("*").alias("cnt"))
              .filter(F.col("cnt") <= _PR_CAP).select("shingle"))
    sh = sh0.join(capped, "shingle")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    # one pair occurrence per shared shingle -> count IS the
    # intersection (the shared posting-list kernel, llm/dedup.py)
    inter = (D.pairs_from_postings(sh, ["shingle"], "doc_id")
             .groupBy("id_a", "id_b")
             .agg(F.count("*").cast("long").alias("i")))
    ca = counts.select(F.col("doc_id").alias("id_a"),
                       F.col("c").alias("ca"))
    cb = counts.select(F.col("doc_id").alias("id_b"),
                       F.col("c").alias("cb"))
    jac = (inter.join(F.broadcast(ca), "id_a")
           .join(F.broadcast(cb), "id_b")
           .select("id_a", "id_b", "i",
                   (F.col("ca") + F.col("cb") - F.col("i")).alias("u")))
    cand = D.lsh_candidate_pairs(docs)
    nc = cand.agg(F.count("*").cast("long").alias("n_cand"))
    th = spark.createDataFrame([(t,) for t in _PR_TENTHS], ["tt"])
    truth = (jac.crossJoin(F.broadcast(th))
             .filter(10 * F.col("i") >= F.col("tt") * F.col("u"))
             .select("tt", "id_a", "id_b"))
    nt = truth.groupBy("tt").agg(F.count("*").cast("long").alias("n_truth"))
    tp = (truth.join(cand, ["id_a", "id_b"])
          .groupBy("tt").agg(F.count("*").cast("long").alias("tp")))
    out = (th.join(nt, "tt", "left").join(tp, "tt", "left")
           .crossJoin(F.broadcast(nc)))
    n_truth = F.coalesce("n_truth", F.lit(0))
    n_tp = F.coalesce("tp", F.lit(0))
    return out.select(
        F.round(F.col("tt") / 10.0, 1).alias("threshold"),
        n_truth.cast("long").alias("n_truth"),
        F.col("n_cand"),
        n_tp.cast("long").alias("n_tp"),
        F.when(F.col("n_cand") > 0,
               F.round(n_tp.cast("double") / F.col("n_cand"), 6))
        .alias("precision_at_t"),
        F.when(n_truth > 0,
               F.round(n_tp.cast("double") / n_truth, 6))
        .alias("recall_at_t"))


def _sem_lex_oracle() -> str:
    selects = []
    for t in range(S.LSH_TABLES):
        planes = S.hyperplanes(S.LSH_TABLE_PLANES, seed=S.LSH_SEED + t)
        bits = " || ".join(
            "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"{p!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
            for p in planes)
        selects.append(
            f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM embeddings")
    union = "\n      UNION ALL\n".join(selects)
    return f"""
    WITH b AS ({union}),
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM b x JOIN b y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
    cos AS (
      SELECT c.id_a, c.id_b,
             round(list_cosine_similarity(
               CAST(ea.embedding AS DOUBLE[]),
               CAST(eb.embedding AS DOUBLE[])), 4) AS cosine
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b),
    {SHINGLES_CTE},
    counts AS (SELECT doc_id, count(*) AS c FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS i
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT i.id_a, i.id_b,
             round(i.i * 1.0 / (ca.c + cb.c - i.i), 6) AS jaccard
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b)
    SELECT c.id_a, c.id_b, c.cosine,
           coalesce(j.jaccard, 0.0) AS jaccard
    FROM cos c LEFT JOIN jac j
      ON j.id_a = c.id_a AND j.id_b = c.id_b
    ORDER BY c.cosine DESC, c.id_a, c.id_b
    LIMIT 20
    """


@register("dedup_semantic_lexical_pairs", oracle=_sem_lex_oracle(),
          tags=("llm", "dedup", "similarity"))
def dedup_semantic_lexical_pairs(spark, sf_dir):
    """Cross-modal near-dup triage: embedding-LSH candidate pairs
    (documents and embeddings share the id space) scored by BOTH
    cosine similarity and lexical n-gram Jaccard — high-cosine/low-
    Jaccard pairs are paraphrases (keep for diversity), high-both are
    near-copies (dedup). Top-20 by cosine with deterministic id
    tiebreaks. Scale: candidates come from the bucketed LSH join; the
    Jaccard side attaches by pair key (a keyed join against the
    shingle-pair relation), so neither modality ever goes all-pairs."""
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    cand = S.lsh_multi_table_pairs(emb)
    ea = emb.select(F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("id_b"),
                    F.col("embedding").alias("emb_b"))
    from ..functions.vector import cosine_similarity
    cos = (cand.join(ea, "id_a").join(eb, "id_b")
           .select("id_a", "id_b",
                   F.round(cosine_similarity("emb_a", "emb_b"), 4)
                   .alias("cosine")))
    sh = D.word_shingles(docs)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    # intersection computed for CANDIDATE pairs only (the
    # lsh_verified_pairs cost shape: candidates join shingles by id_a,
    # then by (id_b, shingle) — candidate docs' shingles only, never
    # every shingle-sharing pair in the corpus)
    inter = (cand
             .join(sh.select(F.col("doc_id").alias("id_a"), "shingle"),
                   "id_a")
             .join(sh.select(F.col("doc_id").alias("id_b"),
                             F.col("shingle").alias("shingle")),
                   ["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").cast("long").alias("i")))
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("c").alias("ca"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("c").alias("cb"))
    jac = (inter.join(F.broadcast(ca), "id_a")
           .join(F.broadcast(cb), "id_b")
           .select("id_a", "id_b",
                   F.round(F.col("i") / (F.col("ca") + F.col("cb")
                                         - F.col("i")), 6).alias("jaccard")))
    return (cos.join(jac, ["id_a", "id_b"], "left")
            .select("id_a", "id_b", "cosine",
                    F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"))
            .orderBy(F.col("cosine").desc(), "id_a", "id_b")
            .limit(20))


@register(
    "curation_dedup_funnel",
    oracle=f"""
    WITH s0 AS (SELECT doc_id, text FROM documents),
    s1 AS (  -- exact: keep min doc_id per content hash
      SELECT min(doc_id) AS doc_id FROM s0 GROUP BY md5(text)),
    s1d AS (SELECT s0.doc_id, s0.text FROM s0
            JOIN s1 ON s0.doc_id = s1.doc_id),
    s2 AS (  -- normalized exact on exact survivors
      SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
        FROM s1d) GROUP BY h),
    s2d AS (SELECT s0.doc_id, s0.text FROM s0
            JOIN s2 ON s0.doc_id = s2.doc_id),
    {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    drop3 AS (  -- near-dup: drop the larger id of a surviving pair
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c
      JOIN s2 x ON x.doc_id = c.id_a
      JOIN s2 y ON y.doc_id = c.id_b),
    s3 AS (SELECT doc_id FROM s2
           WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
    stages AS (
      SELECT 0 AS stage, 'raw' AS stage_name,
             CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_docs
      UNION ALL SELECT 1, 'exact',
             CAST((SELECT count(*) FROM s1) AS BIGINT)
      UNION ALL SELECT 2, 'normalized',
             CAST((SELECT count(*) FROM s2) AS BIGINT)
      UNION ALL SELECT 3, 'minhash_lsh',
             CAST((SELECT count(*) FROM s3) AS BIGINT))
    SELECT CAST(stage AS INT) AS stage, stage_name, n_docs FROM stages
    """,
    tags=("llm", "dedup", "curation"),
)
def curation_dedup_funnel(spark, sf_dir):
    """The dedup FUNNEL a corpus build reports: documents surviving
    each successive stage — raw → exact hash → normalized hash →
    MinHash-LSH near-dup — each stage operating on the previous
    stage's survivors (the real pipeline composition, not four
    independent counts; `curation_pipeline` is the quality-gate
    sibling). Near-dup keeps the smaller id of each surviving
    candidate pair (the banded index proposes; no all-pairs). Every
    stage is a hash-keyed aggregate or anti-join over 16-32 byte
    digests — document bodies never shuffle."""
    docs = table(spark, sf_dir, "documents")
    s0 = docs.select("doc_id", "text")
    s1 = (s0.groupBy(F.md5("text"))
          .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    s1d = s0.join(s1, "doc_id")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "))
    s2 = (s1d.groupBy(F.md5(norm))
          .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    cand = D.lsh_candidate_pairs(docs)
    drop3 = (cand
             .join(s2.select(F.col("doc_id").alias("id_a")), "id_a")
             .join(s2.select(F.col("doc_id").alias("id_b")), "id_b")
             .select(F.col("id_b").alias("doc_id")).distinct())
    s3 = s2.join(drop3, "doc_id", "left_anti")

    def stage(i, name, df):
        return df.agg(F.count("*").cast("long").alias("n_docs")).select(
            F.lit(i).cast("int").alias("stage"),
            F.lit(name).alias("stage_name"), "n_docs")

    return (stage(0, "raw", s0)
            .unionAll(stage(1, "exact", s1))
            .unionAll(stage(2, "normalized", s2))
            .unionAll(stage(3, "minhash_lsh", s3)))
