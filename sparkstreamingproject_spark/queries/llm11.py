"""Round-7 continued unfreeze, wave 6: leakage-safe splitting and
collocation mining — two curation ops a training-data pipeline runs
between dedup and packing.

- ``split_cluster_leakage_safe``: the standard doc-id-hash split
  (`split_train_val_test`) leaks when near-duplicate documents land in
  different splits (train/test contamination through paraphrases).
  The fix is to split by NEAR-DUP CLUSTER: hash the connected-component
  label of the MinHash-LSH candidate graph, so every near-dup family
  moves as one unit. The query reports the per-split population AND
  the counterfactual audit — how many candidate pairs the naive
  doc-hash split would have torn across splits vs the cluster split
  (structurally zero, computed anyway as the proof).
- ``text_pmi_collocations``: corpus-level association mining — top
  bigrams by PMI lift p(xy)/(p(x)p(y)), the classic collocation
  statistic. All counting integer; the lift is an exact truncating
  DECIMAL(38,0)/HUGEINT ratio scaled by 1e6 (no logs, no floats), so
  ranking and values hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..llm import dedup as D
from .base import register, table
from .llm import MINHASH_CTE, _BAND_SELECTS

# ---------------------------------------------- leakage-safe splits

_SPLIT_SQL = """CASE WHEN {b} < 80 THEN 'train'
                     WHEN {b} < 90 THEN 'val' ELSE 'test' END"""


@register(
    "split_cluster_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    e AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    walk(u, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.v, walk.label FROM walk JOIN e ON e.u = walk.u),
    comp AS (SELECT u AS doc_id, min(label) AS component
             FROM walk GROUP BY u),
    allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id)
                      AS component
             FROM documents d LEFT JOIN comp c USING (doc_id)),
    asg AS (
      SELECT doc_id, component,
             {_SPLIT_SQL.format(b="bc")} AS split,
             {_SPLIT_SQL.format(b="bd")} AS naive_split
      FROM (SELECT doc_id, component,
                   CAST(('0x' || substr(md5(CAST(component AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 100 AS bc,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 100 AS bd
            FROM allc)),
    leaks AS (
      SELECT CAST(coalesce(sum(CASE WHEN x.naive_split <> y.naive_split
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS naive_leaked_pairs,
             CAST(coalesce(sum(CASE WHEN x.split <> y.split
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS cluster_leaked_pairs
      FROM pairs p JOIN asg x ON x.doc_id = p.id_a
                   JOIN asg y ON y.doc_id = p.id_b)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
           naive_leaked_pairs, cluster_leaked_pairs
    FROM asg CROSS JOIN leaks
    GROUP BY split, naive_leaked_pairs, cluster_leaked_pairs
    """,
    tags=("llm", "dedup", "sample"),
)
def split_cluster_leakage_safe(spark, sf_dir):
    """Leakage-safe 80/10/10 split: membership is a pure function of
    the near-dup CLUSTER label (connected component over MinHash-LSH
    candidate pairs, singletons = own doc_id), so paraphrase families
    never straddle train/test. Per-split counts ride with the audit
    pair-leak counters: the naive doc-hash split's torn pairs
    (non-zero wherever clusters exist) vs the cluster split's
    (structurally zero — same component, same hash, same split).

    Scale shape: the pair graph and CC labels reuse the banded-LSH +
    O(diameter) label-propagation machinery (`llm/dedup.py`); split
    assignment and both audits are hash-equi-joins on doc_id — no new
    all-pairs or global-sort stages. Oracle recomputes the identical
    fixpoint with a recursive CTE."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.lsh_candidate_pairs(docs)
    cc = D.connected_components(pairs)
    allc = (docs.select("doc_id")
            .join(cc.withColumnRenamed("u", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("label", "doc_id").alias("component")))

    def bucket(col):
        return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8),
                       16, 10).cast("long") % 100)

    def split_of(b):
        return F.when(b < 80, "train").when(b < 90, "val") \
            .otherwise("test")

    asg = allc.select(
        "doc_id", "component",
        split_of(bucket(F.col("component"))).alias("split"),
        split_of(bucket(F.col("doc_id"))).alias("naive_split"))

    x = asg.select(F.col("doc_id").alias("id_a"),
                   F.col("split").alias("sa"),
                   F.col("naive_split").alias("na"))
    y = asg.select(F.col("doc_id").alias("id_b"),
                   F.col("split").alias("sb"),
                   F.col("naive_split").alias("nb"))
    leaks = (pairs.join(x, "id_a").join(y, "id_b")
             .agg(F.coalesce(F.sum(F.when(F.col("na") != F.col("nb"), 1)
                                   .otherwise(0)), F.lit(0))
                  .cast("long").alias("naive_leaked_pairs"),
                  F.coalesce(F.sum(F.when(F.col("sa") != F.col("sb"), 1)
                                   .otherwise(0)), F.lit(0))
                  .cast("long").alias("cluster_leaked_pairs")))
    per = (asg.groupBy("split")
           .agg(F.count("*").alias("n_docs"),
                F.countDistinct("component").alias("n_clusters")))
    return (per.crossJoin(F.broadcast(leaks))
            .select("split", "n_docs", "n_clusters",
                    "naive_leaked_pairs", "cluster_leaked_pairs"))


# ---------------------------------------------- PMI collocations

_PMI_MIN_COUNT = 5
_PMI_TOPN = 25


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    uni AS (SELECT unnest(t) AS w FROM toks),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni
           GROUP BY 1),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM uni),
    big AS (SELECT t[i] AS w1, t[i+1] AS w2
            FROM toks, unnest(range(1, len(t))) AS g(i)),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM big),
    bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM big
           GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_COUNT}),
    lift AS (
      SELECT w1, w2, n_xy,
             CAST(CAST(n_xy AS HUGEINT) * n_uni * n_uni * 1000000
                  // (CAST(a.n_w AS HUGEINT) * b.n_w * n_bi)
                  AS BIGINT) AS lift_e6
      FROM bc JOIN uc a ON a.w = bc.w1
              JOIN uc b ON b.w = bc.w2
              CROSS JOIN nu CROSS JOIN nb)
    SELECT CAST(rank AS INT) AS rank, w1, w2, n_xy, lift_e6
    FROM (SELECT w1, w2, n_xy, lift_e6,
                 row_number() OVER (ORDER BY lift_e6 DESC, w1, w2)
                   AS rank
          FROM lift)
    WHERE rank <= {_PMI_TOPN}
    """,
    tags=("llm", "text"),
)
def text_pmi_collocations(spark, sf_dir):
    """Top-{_PMI_TOPN} collocations by PMI lift
    p(xy)/(p(x)p(y)) = n_xy*N_uni^2 / (n_x*n_y*N_bi) — the corpus
    association statistic behind phrase detection (word2vec phrase
    pass, gensim Phrases). The lift is an exact scaled truncating
    ratio in DECIMAL(38,0) (products reach ~1e24 at 100 TB corpus
    sizes, past int64), no logs — so values AND tie-broken ranking
    hash-match the oracle.

    Shape at scale: bigram and unigram counting are map-side
    aggregates; the lift join is two hash joins against the unigram
    relation keyed by word (skew-prone on stopwords, mitigated by the
    HAVING floor pruning the long tail before the join); global top-N
    is TakeOrdered — no full sort."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("n_w"))
    nu = uni.agg(F.count("*").alias("n_uni"))
    idx = F.when(F.size("t") >= 2,
                 F.sequence(F.lit(1), F.size("t") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    big = (toks.select(F.explode(F.transform(
        idx, lambda i: F.struct(
            F.element_at("t", i).alias("w1"),
            F.element_at("t", i + 1).alias("w2")))).alias("b"))
        .select("b.w1", "b.w2"))
    nb = big.agg(F.count("*").alias("n_bi"))
    bc = (big.groupBy("w1", "w2").agg(F.count("*").alias("n_xy"))
          .filter(F.col("n_xy") >= _PMI_MIN_COUNT))
    lift = (bc.join(uc.select(F.col("w").alias("w1"),
                              F.col("n_w").alias("na")), "w1")
            .join(uc.select(F.col("w").alias("w2"),
                            F.col("n_w").alias("nb_w")), "w2")
            .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb))
            .select("w1", "w2", "n_xy",
                    F.expr("CAST(CAST(n_xy AS DECIMAL(38,0)) * n_uni"
                           " * n_uni * 1000000 div"
                           " (CAST(na AS DECIMAL(38,0)) * nb_w * n_bi)"
                           " AS BIGINT)").alias("lift_e6")))
    w = Window.orderBy(F.desc("lift_e6"), "w1", "w2")
    return (lift.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _PMI_TOPN)
            .select(F.col("rank").cast("int").alias("rank"),
                    "w1", "w2", "n_xy", "lift_e6"))


# ------------------------------------------- survivorship merge


@register(
    "er_survivorship_golden_record",
    oracle=f"""
    WITH RECURSIVE {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    e AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    walk(u, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM e)
      UNION
      SELECT e.v, walk.label FROM walk JOIN e ON e.u = walk.u),
    comp AS (SELECT u AS doc_id, min(label) AS component
             FROM walk GROUP BY u),
    members AS (
      SELECT c.component, d.doc_id, d.lang, d.source, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)),
    votes AS (
      SELECT component, lang, count(*) AS n,
             row_number() OVER (PARTITION BY component
                                ORDER BY count(*) DESC, lang) AS rk
      FROM members GROUP BY component, lang)
    SELECT m.component,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(m.doc_id) AS BIGINT) AS canonical_id,
           max(v.lang) AS golden_lang,
           CAST(max(m.n_chars) AS BIGINT) AS golden_text_chars,
           CAST(count(DISTINCT m.source) AS BIGINT) AS n_sources
    FROM members m JOIN votes v ON v.component = m.component
                               AND v.rk = 1
    GROUP BY m.component
    """,
    tags=("llm", "dedup"),
)
def er_survivorship_golden_record(spark, sf_dir):
    """Entity-resolution FIELD-level survivorship — the MDM merge
    step after clustering, distinct from the row-level
    `dedup_cluster_keep_best` (which keeps ONE member): each golden
    field comes from its own rule across ALL cluster members —
    canonical id = min doc_id (stable key), lang = majority vote with
    lexical tiebreak, text length = longest member, plus the
    provenance counters (members, distinct sources) an MDM audit
    needs. Only multi-doc clusters (CC over LSH candidate pairs)
    appear; singletons have nothing to merge.

    Scale shape: reuses the banded-LSH + label-propagation machinery;
    the merge itself is one aggregate over the (tiny) clustered-docs
    relation plus a per-cluster vote window. All rules are exact
    (counts, min/max, lexical ties) — no scoring floats."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.lsh_candidate_pairs(docs)
    cc = D.connected_components(pairs)
    members = (cc.select(F.col("u").alias("doc_id"),
                         F.col("label").alias("component"))
               .join(docs.select("doc_id", "lang", "source",
                                 "n_chars"), "doc_id"))
    votes = (members.groupBy("component", "lang")
             .agg(F.count("*").alias("n")))
    wv = Window.partitionBy("component").orderBy(F.desc("n"), "lang")
    top_lang = (votes.withColumn("rk", F.row_number().over(wv))
                .filter(F.col("rk") == 1)
                .select("component", F.col("lang").alias("golden_lang")))
    return (members.groupBy("component")
            .agg(F.count("*").alias("n_members"),
                 F.min("doc_id").alias("canonical_id"),
                 F.max("n_chars").alias("golden_text_chars"),
                 F.countDistinct("source").alias("n_sources"))
            .join(top_lang, "component")
            .select("component", "n_members", "canonical_id",
                    "golden_lang", "golden_text_chars", "n_sources"))
