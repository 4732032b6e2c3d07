"""Round-11 LLM wave 3: random-projection-tree ANN (the Annoy family)
and Rocchio pseudo-relevance feedback (classic IR query expansion).

The ANN shelf so far covers hash-partitioned (sign-LSH, multiprobe),
quantized (PQ/RQ/IVFADC), and graph (kNN/NN-descent/two-layer) index
families. The missing classic is the TREE family — Annoy/spill-tree
style recursive median splits on random projections. Its distinguishing
property vs sign-LSH is DATA-ADAPTIVE splits: the median guarantees
balanced halves whatever the distribution, so leaf sizes (and hence
query cost) are bounded by construction, where LSH bucket sizes follow
the data. One registered query builds a depth-2 tree (4 leaves) and
evaluates sampled recall@10 against exact ground truth — the same
protocol as `sim_recall_at_k_eval` (its docstring's uniform-sphere
caveat applies here too: recall on synthetic near-uniform embeddings
is expected to be low; the query exists to measure it in-engine).

Rocchio PRF (Rocchio 1971, the `Lucene MoreLikeThis` lineage): run the
seed query, take the top-R documents as pseudo-relevant, harvest the
strongest feedback terms, re-run BM25 with the expanded term set. Both
stages reuse the BM25 float discipline (idf·tf trees rounded 4dp
before every ranking).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import similarity as S
from .base import register, table

# ----------------------------------------- RP-tree sampled recall@10

_RP_K = 10
_RP_MOD = 499          # vec_id % mod == 0 -> deterministic query subset


def _rp_median_sql(proj_rel: str, part: str) -> str:
    """Lower median of ``p`` within partitions ``part`` — the
    ((n+1)//2)-th smallest 6dp-rounded projection, an order statistic
    both engines agree on exactly."""
    return f"""
      SELECT {part}, p AS med FROM (
        SELECT {part}, p,
               row_number() OVER (PARTITION BY {part} ORDER BY p, vec_id)
                 AS rn,
               count(*) OVER (PARTITION BY {part}) AS n
        FROM {proj_rel})
      WHERE rn = (n + 1) // 2"""


def _rp_tree_oracle() -> str:
    p1, p2 = S.hyperplanes(2)
    return f"""
    WITH pr AS (
      SELECT vec_id, embedding,
             round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    {p1!r}::DOUBLE[]), 6) AS p,
             round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    {p2!r}::DOUBLE[]), 6) AS p2
      FROM embeddings),
    all1 AS (SELECT vec_id, p, 0 AS root FROM pr),
    m1 AS ({_rp_median_sql("all1", "root")}),
    l1 AS (
      SELECT pr.vec_id, pr.embedding, pr.p2,
             CASE WHEN pr.p <= m1.med THEN 'L' ELSE 'R' END AS s1
      FROM pr CROSS JOIN m1),
    all2 AS (SELECT vec_id, p2 AS p, s1 FROM l1),
    m2 AS ({_rp_median_sql("all2", "s1")}),
    lv AS (
      SELECT l1.vec_id, l1.embedding,
             l1.s1 || (CASE WHEN l1.p2 <= m2.med THEN 'L' ELSE 'R' END)
               AS leaf
      FROM l1 JOIN m2 ON m2.s1 = l1.s1),
    q AS (SELECT * FROM lv WHERE vec_id % {_RP_MOD} = 0),
    gt AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM q JOIN lv c ON c.vec_id != q.vec_id)
      WHERE rank <= {_RP_K}),
    ann AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rank
        FROM q JOIN lv c ON c.leaf = q.leaf AND c.vec_id != q.vec_id)
      WHERE rank <= {_RP_K}),
    cn AS (
      SELECT q.vec_id AS query_id, q.leaf,
             count(c.vec_id) AS n_candidates
      FROM q LEFT JOIN lv c ON c.leaf = q.leaf AND c.vec_id != q.vec_id
      GROUP BY 1, 2),
    hits AS (
      SELECT g.query_id, count(a.cand_id) AS n_hits
      FROM gt g LEFT JOIN ann a
        ON g.query_id = a.query_id AND g.cand_id = a.cand_id
      GROUP BY 1)
    SELECT cn.query_id, cn.leaf,
           CAST(cn.n_candidates AS BIGINT) AS n_candidates,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n_hits, 0) / {float(_RP_K)!r}, 4) AS recall
    FROM cn LEFT JOIN hits h ON cn.query_id = h.query_id
    """


@register(
    "sim_rp_tree_recall",
    oracle=_rp_tree_oracle(),
    tags=("llm", "similarity", "eval"),
)
def sim_rp_tree_recall(spark, sf_dir):
    """Depth-2 random-projection tree (Annoy-style) with sampled
    recall@10: project every vector onto two deterministic random
    directions, split at the LOWER MEDIAN at each level (the
    ((n+1)//2)-th smallest 6dp-rounded projection — an order statistic
    both engines agree on exactly), route queries down the same
    comparisons, brute-force only within the landed leaf.

    vs sign-LSH: the median makes splits data-adaptive — each level
    halves every node, so the depth-d leaf holds n/2^d vectors by
    construction (bounded query cost), where LSH buckets can be
    arbitrarily skewed. At 100 TB the medians come from a per-level
    order-statistic aggregate (or an approx-quantile with a recorded
    rank tolerance), the tree is a ~3-row broadcast, and routing is a
    map-side projection — the corpus never self-joins; candidate
    generation is leaf-keyed like every banded kernel here. Production
    Annoy builds a FOREST of such trees and unions leaves
    (OR-amplification — `sim_ann_lsh_or_pairs` quantifies the same
    trick for hashes); one tree is the registered, oracle-checkable
    unit."""
    p1, p2 = S.hyperplanes(2)
    emb = table(spark, sf_dir, "embeddings")
    pr = emb.select(
        "vec_id", "embedding",
        F.round(S._dot_with_literal(F.col("embedding"), p1), 6).alias("p"),
        F.round(S._dot_with_literal(F.col("embedding"), p2), 6).alias("p2"))

    def lower_median(df, part_cols, val="p"):
        w = Window.partitionBy(*part_cols).orderBy(val, "vec_id")
        wn = Window.partitionBy(*part_cols)
        return (df.withColumn("rn", F.row_number().over(w))
                .withColumn("n", F.count("*").over(wn))
                .filter(F.col("rn") == F.expr("(n + 1) div 2"))
                .select(*part_cols, F.col(val).alias("med")))

    m1 = lower_median(pr.withColumn("root", F.lit(0)), ["root"])
    l1 = (pr.crossJoin(F.broadcast(m1.drop("root")))
          .select("vec_id", "embedding", "p2",
                  F.when(F.col("p") <= F.col("med"), "L").otherwise("R")
                  .alias("s1")))
    m2 = lower_median(l1.withColumnRenamed("p2", "p"), ["s1"])
    lv = (l1.join(F.broadcast(m2), "s1")
          .select("vec_id", "embedding",
                  F.concat("s1", F.when(F.col("p2") <= F.col("med"),
                                        "L").otherwise("R")).alias("leaf")))
    q = lv.filter(F.col("vec_id") % _RP_MOD == 0)
    gt = S.brute_force_topk(lv, q, k=_RP_K).select("query_id", "cand_id")
    qk = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"), "leaf")
    cand = (lv.join(F.broadcast(qk), "leaf")
            .filter(F.col("vec_id") != F.col("query_id")))
    wq = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                                "vec_id")
    ann = (cand.select("query_id",
                       F.col("vec_id").alias("cand_id"),
                       F.round(S.cosine_similarity("q_emb", "embedding"),
                               6).alias("cos"))
           .withColumnRenamed("cand_id", "vec_id")
           .withColumn("rank", F.row_number().over(wq))
           .filter(F.col("rank") <= _RP_K)
           .select("query_id", F.col("vec_id").alias("cand_id")))
    # self-exclusion lives IN the join condition (not a post-filter):
    # a singleton leaf must null-extend to n_candidates=0, matching the
    # oracle's `LEFT JOIN .. ON c.leaf = q.leaf AND c.vec_id != q.vec_id`
    # (a post-join filter would delete the group entirely).
    cand_lv = lv.select(F.col("vec_id").alias("cand_id"),
                        F.col("leaf").alias("c_leaf"))
    cn = (qk.join(cand_lv,
                  (F.col("c_leaf") == F.col("leaf"))
                  & (F.col("cand_id") != F.col("query_id")), "left")
          .groupBy("query_id", "leaf")
          .agg(F.count("cand_id").alias("n_candidates")))
    hits = (gt.join(ann.withColumn("hit", F.lit(1)),
                    ["query_id", "cand_id"], "left")
            .groupBy("query_id").agg(F.count("hit").alias("n_hits")))
    return (cn.join(hits, "query_id", "left")
            .select("query_id", "leaf",
                    F.col("n_candidates").cast("long"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0))
                            / float(_RP_K), 4).alias("recall")))


# --------------------------------------- Rocchio pseudo-relevance PRF

_PRF_SEED = ["spark", "merge"]
_PRF_R = 3      # pseudo-relevant docs fed back
_PRF_E = 2      # expansion terms harvested
_PRF_TOP = 10
_K1, _B = 1.2, 0.75


def _bm25_ctes(terms_rel: str, prefix: str) -> str:
    """BM25 scoring CTE chain against a (word) relation — shared by
    both Rocchio stages so the two rankings use the identical float
    tree."""
    return f"""
    {prefix}tf AS (
      SELECT w.doc_id, w.word, CAST(count(*) AS BIGINT) AS tf
      FROM words w JOIN {terms_rel} t ON t.word = w.word
      GROUP BY 1, 2),
    {prefix}df AS (SELECT word, count(DISTINCT doc_id) AS df
                   FROM {prefix}tf GROUP BY 1),
    {prefix}scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({_K1} + 1))
               / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))), 4)
               AS bm25
      FROM {prefix}tf AS tf
      JOIN {prefix}df AS df USING (word)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id)"""


def _rocchio_oracle() -> str:
    seed = ", ".join(f"('{t}')" for t in _PRF_SEED)
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT count(*) AS n_docs, (SELECT avg(dl) FROM dl) AS avgdl
      FROM documents),
    seed(word) AS (VALUES {seed}),
    {_bm25_ctes("seed", "s1")},
    fb AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM s1scored)
      WHERE rn <= {_PRF_R}),
    exp_terms AS (
      SELECT word FROM (
        SELECT w.word, CAST(count(*) AS BIGINT) AS c,
               row_number() OVER (ORDER BY count(*) DESC, w.word) AS rn
        FROM words w
        JOIN fb ON fb.doc_id = w.doc_id
        WHERE w.word <> '' AND w.word NOT IN (SELECT word FROM seed)
        GROUP BY w.word)
      WHERE rn <= {_PRF_E}),
    full_terms AS (SELECT word FROM seed
                   UNION SELECT word FROM exp_terms),
    {_bm25_ctes("full_terms", "s2")}
    SELECT doc_id, bm25,
           CAST(rn AS INT) AS rnk
    FROM (SELECT doc_id, bm25,
                 row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
          FROM s2scored)
    WHERE rn <= {_PRF_TOP}
    """


@register(
    "text_rocchio_prf",
    oracle=_rocchio_oracle(),
    tags=("llm", "text", "search"),
)
def text_rocchio_prf(spark, sf_dir):
    """Rocchio pseudo-relevance feedback: BM25 with the seed terms
    {_PRF_SEED} → top-{_PRF_R} docs assumed relevant → the {_PRF_E}
    strongest feedback terms (by exact feedback-set term count,
    seed terms excluded, word tie-break) join the query → BM25 again
    with the expanded set → final top-{_PRF_TOP}. The classic
    two-pass query-expansion loop (Rocchio 1971; Lucene
    MoreLikeThis), registered as ONE query so the whole feedback loop
    is oracle-checked — including the data-dependent term harvest.

    Both BM25 stages share one float discipline (idf·tf tree rounded
    4dp before every ranking) and one scan-derived words relation.
    Scale: stage outputs are doc-keyed aggregates; the expanded term
    relation is ≤ {len(_PRF_SEED) + _PRF_E} rows (broadcast — bounded
    by construction, not by data); the feedback term count touches
    only the {_PRF_R} pseudo-relevant docs via a semi-join."""
    docs = table(spark, sf_dir, "documents")
    words = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("word"))
             .filter(F.col("word") != ""))
    dl = docs.select("doc_id",
                     F.size(F.split("text", " ")).alias("dl"))
    stats = (docs.agg(F.count("*").alias("n_docs"))
             .crossJoin(dl.agg(F.avg("dl").alias("avgdl"))))

    def bm25(terms_df):
        tf = (words.join(F.broadcast(terms_df), "word")
              .groupBy("doc_id", "word")
              .agg(F.count("*").cast("long").alias("tf")))
        dfreq = tf.groupBy("word").agg(F.countDistinct("doc_id")
                                       .alias("df"))
        idf = F.log((F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5) + 1.0)
        term_score = (idf * (F.col("tf") * (_K1 + 1))
                      / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl")
                                              / F.col("avgdl"))))
        return (tf.join(F.broadcast(dfreq), "word")
                .join(dl, "doc_id")
                .crossJoin(F.broadcast(stats))
                .groupBy("doc_id")
                .agg(F.round(F.sum(term_score), 4).alias("bm25")))

    seed = spark.createDataFrame([(t,) for t in _PRF_SEED], "word string")
    s1 = bm25(seed)
    w1 = Window.orderBy(F.col("bm25").desc(), "doc_id")
    fb = (s1.withColumn("rn", F.row_number().over(w1))
          .filter(F.col("rn") <= _PRF_R).select("doc_id"))
    wexp = Window.orderBy(F.col("c").desc(), "word")
    exp_terms = (words.join(F.broadcast(fb), "doc_id", "left_semi")
                 .join(F.broadcast(seed), "word", "left_anti")
                 .groupBy("word").agg(F.count("*").cast("long").alias("c"))
                 .withColumn("rn", F.row_number().over(wexp))
                 .filter(F.col("rn") <= _PRF_E).select("word"))
    full_terms = seed.unionByName(exp_terms).distinct()
    s2 = bm25(full_terms)
    w2 = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (s2.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= _PRF_TOP)
            .select("doc_id", "bm25", F.col("rn").cast("int").alias("rnk")))
