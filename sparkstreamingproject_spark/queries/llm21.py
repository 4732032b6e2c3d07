"""Round-14 eval-report wave (VERDICT r13 §next 6): eval-time text
surfaces that COMPOSE already-certified pieces — the reports a
training-data team actually reads before a run, built from the
registry's certified dedup/decontamination/quality/token kernels
instead of new primitives.

- `report_contamination_by_source` joins the fuzzy-decontamination
  output (`llm18.decontaminate_minhash`, called as a relation) with
  per-source test-split stats — "which source leaks into my evals".
- `report_split_leakage_matrix` measures shingle-set overlap between
  the train/val/test hash splits (the `split_train_val_test`
  convention) — the aggregate view `split_cluster_leakage_safe`
  fixes, as a report.
- `report_dedup_retention_funnel` runs the exact keep-first rule and
  the r13 paragraph-chunk keep-first rule (`llm20.chunk_relation`)
  per source — "how much survives each dedup stage".
- `report_token_mix_by_quality` crosses the certified quality labels
  (`llm/textstats.quality_score`) with token counts per source — the
  training-mix table.
- `report_top_duplicated_chunks` is the top-k boilerplate report off
  the paragraph-chunk relation (heap top-k, not a global sort).

All five are aggregates over bounded relations — no pairwise stages;
the heaviest shapes are the shingle-keyed joins the dedup family
already certifies linear.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import dedup as D
from ..llm.textstats import quality_score
from .base import REGISTRY, register, table
from .llm import SHINGLES_CTE, dedup_connected_components
from .llm18 import decontaminate_minhash
from .llm2 import SPLIT_SQL as _SPLIT_SQL
from .llm2 import _BUCKET_SQL, _bucket_col
from .llm2 import split_col as _split_col
from .llm20 import PARA_W, chunk_relation, chunks_cte


def _contamination_oracle() -> str:
    dc = REGISTRY["decontaminate_minhash"].oracle
    return f"""
    WITH dc AS ({dc}),
    te AS (SELECT doc_id, source FROM documents WHERE {_BUCKET_SQL} >= 90)
    SELECT te.source,
           CAST(count(*) AS BIGINT) AS n_test_docs,
           CAST(count(dc.test_id) AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN dc.is_contaminated THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           round(sum(CASE WHEN dc.is_contaminated THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS contamination_rate,
           max(dc.max_jaccard) AS max_jaccard,
           CAST(coalesce(sum(dc.n_confirmed), 0) AS BIGINT)
               AS n_confirmed_pairs
    FROM te LEFT JOIN dc ON dc.test_id = te.doc_id
    GROUP BY te.source
    """


@register(
    "report_contamination_by_source",
    oracle=_contamination_oracle(),
    tags=("llm", "curation", "report"),
)
def report_contamination_by_source(spark, sf_dir):
    """Contamination overlap REPORT: the fuzzy decontamination output
    (`decontaminate_minhash` — MinHash band probe + exact-Jaccard
    verify, test split vs train split) joined back to the test split
    and aggregated per source — test docs, flagged (any banded
    candidate), confirmed contaminated, contamination rate, worst
    Jaccard, and total confirmed pairs. The relation a curation team
    reads to decide WHICH SOURCE'S eval split is unusable; composes
    the certified decon pipeline as a sub-relation (its fold-
    maintained band index serves the probe at scale).

    Scale: everything downstream of the (already linear) decon kernel
    is one left join on doc_id + one groupBy(source) over the test
    split only. Rate rounded 6dp; counts exact integers."""
    d = table(spark, sf_dir, "documents")
    te = (d.filter(_bucket_col() >= 90).select("doc_id", "source"))
    dc = decontaminate_minhash(spark, sf_dir) \
        .withColumnRenamed("test_id", "doc_id")
    return (te.join(dc, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_test_docs"),
                 F.count("n_candidates").cast("long").alias("n_flagged"),
                 F.sum(F.when(F.col("is_contaminated"), 1).otherwise(0))
                 .cast("long").alias("n_contaminated"),
                 F.round(F.sum(F.when(F.col("is_contaminated"), 1)
                               .otherwise(0)) / F.count("*"), 6)
                 .alias("contamination_rate"),
                 F.max("max_jaccard").alias("max_jaccard"),
                 F.coalesce(F.sum("n_confirmed"), F.lit(0)).cast("long")
                 .alias("n_confirmed_pairs")))


@register(
    "report_split_leakage_matrix",
    oracle=f"""
    WITH {SHINGLES_CTE},
    lab AS (SELECT doc_id, {_SPLIT_SQL} AS split FROM documents),
    ss AS (SELECT DISTINCT l.split, s.shingle
           FROM shingles s JOIN lab l USING (doc_id)),
    tot AS (SELECT split, CAST(count(*) AS BIGINT) AS n
            FROM ss GROUP BY 1),
    shared AS (
      SELECT a.split AS split_a, b.split AS split_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM ss a JOIN ss b ON b.shingle = a.shingle AND a.split < b.split
      GROUP BY 1, 2)
    SELECT s.split_a, s.split_b, s.n_shared,
           ta.n AS n_shingles_a, tb.n AS n_shingles_b,
           round(s.n_shared * 1.0 / (ta.n + tb.n - s.n_shared), 6)
               AS shingle_jaccard
    FROM shared s
    JOIN tot ta ON ta.split = s.split_a
    JOIN tot tb ON tb.split = s.split_b
    """,
    tags=("llm", "curation", "report"),
)
def report_split_leakage_matrix(spark, sf_dir):
    """Split×split leakage report: for every pair of hash splits
    (the `split_train_val_test` bucket convention), the number of
    k-word shingles present in BOTH splits and the Jaccard of the two
    splits' shingle SETS — the corpus-level "my test split shares
    n-grams with train" number that motivates
    `split_cluster_leakage_safe`.

    Scale: the only wide ops are the distinct over (split, shingle)
    and a shingle-keyed self-join whose per-key fan-out is bounded by
    the number of SPLITS (≤3 rows per shingle side) — linear in
    distinct shingles, never doc-pairwise. Jaccard rounded 6dp."""
    d = table(spark, sf_dir, "documents")
    lab = d.select("doc_id", _split_col().alias("split"))
    ss = (D.word_shingles(d).join(lab, "doc_id")
          .select("split", "shingle").distinct())
    tot = ss.groupBy("split").agg(F.count("*").cast("long").alias("n"))
    a = ss.select(F.col("split").alias("split_a"), "shingle")
    b = ss.select(F.col("split").alias("split_b"), "shingle")
    shared = (a.join(b, "shingle")
              .filter(F.col("split_a") < F.col("split_b"))
              .groupBy("split_a", "split_b")
              .agg(F.count("*").cast("long").alias("n_shared")))
    return (shared
            .join(F.broadcast(tot.select(F.col("split").alias("split_a"),
                                         F.col("n").alias("n_shingles_a"))),
                  "split_a")
            .join(F.broadcast(tot.select(F.col("split").alias("split_b"),
                                         F.col("n").alias("n_shingles_b"))),
                  "split_b")
            .select("split_a", "split_b", "n_shared",
                    "n_shingles_a", "n_shingles_b",
                    F.round(F.col("n_shared")
                            / (F.col("n_shingles_a")
                               + F.col("n_shingles_b")
                               - F.col("n_shared")), 6)
                    .alias("shingle_jaccard")))


@register(
    "report_dedup_retention_funnel",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM documents),
    {chunks_cte(PARA_W)},
    cr AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, cidx) AS rn
      FROM chunks),
    cd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_kept
           FROM cr GROUP BY 1)
    SELECT ex.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ex.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_kept,
           round(sum(CASE WHEN ex.rn = 1 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS exact_retention,
           CAST(sum(cd.n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(cd.n_kept) AS BIGINT) AS n_chunks_kept,
           round(sum(cd.n_kept) * 1.0 / sum(cd.n_chunks), 6)
               AS chunk_retention
    FROM ex JOIN cd USING (doc_id)
    GROUP BY ex.source
    """,
    tags=("llm", "dedup", "report"),
)
def report_dedup_retention_funnel(spark, sf_dir):
    """Dedup retention funnel per source: how many documents survive
    the exact keep-first rule (`dedup_exact`'s discipline — corpus-wide
    first doc per md5(text)) and how many paragraph CHUNKS survive the
    r13 sub-document keep-first rule (`dedup_paragraph_reconstruct`'s
    window, via the shared `llm20.chunk_relation`). The two retention
    columns are the numbers a pipeline owner tracks per ingest source
    — a source whose chunk retention collapses is boilerplate.

    Scale: two corpus-wide windows (one keyed on md5(text), one on
    md5(chunk) — single shuffles, never self-joins), one doc-keyed
    join, one groupBy(source). Same linear posture as the certified
    paragraph-dedup plan."""
    d = table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", "source",
        F.row_number().over(
            Window.partitionBy(F.md5("text")).orderBy("doc_id"))
        .alias("rn"))
    cr = chunk_relation(d).withColumn(
        "rn", F.row_number().over(
            Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "cidx")))
    cd = (cr.groupBy("doc_id")
          .agg(F.count("*").cast("long").alias("n_chunks"),
               F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
               .cast("long").alias("n_kept")))
    return (ex.join(cd, "doc_id")
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                 .cast("long").alias("n_exact_kept"),
                 F.round(F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                         / F.count("*"), 6).alias("exact_retention"),
                 F.sum("n_chunks").cast("long").alias("n_chunks"),
                 F.sum("n_kept").cast("long").alias("n_chunks_kept"),
                 F.round(F.sum("n_kept") / F.sum("n_chunks"), 6)
                 .alias("chunk_retention")))


@register(
    "report_token_mix_by_quality",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             round(len(list_filter(string_split(text, ' '),
                                   w -> list_contains(['the', 'a'], w)))
                   * 1.0 / len(string_split(text, ' ')), 6)
                 AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))
                   * 1.0 / len(string_split(text, ' ')), 6)
                 AS unique_ratio
      FROM documents),
    lab AS (
      SELECT doc_id, n_tokens,
             CASE WHEN unique_ratio < 0.3 THEN 'low_entropy'
                  WHEN stopword_ratio > 0.2 THEN 'boilerplate'
                  ELSE 'ok' END AS quality_label
      FROM feat)
    SELECT d.source, l.quality_label,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(l.n_tokens) AS BIGINT) AS total_tokens,
           round(sum(l.n_tokens) * 1.0
                 / (SELECT sum(n_tokens) FROM lab), 6) AS token_share
    FROM lab l JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
    tags=("llm", "text", "report"),
)
def report_token_mix_by_quality(spark, sf_dir):
    """The training-mix table: token counts per (source, quality
    label), with each cell's share of ALL corpus tokens — what a
    curation team reads to decide sampling weights ("source X is 40%
    of my tokens but mostly boilerplate"). Quality labels come from
    the certified heuristic kernel (`llm/textstats.quality_score`,
    the `text_quality_score` query); token counts are its whitespace
    n_tokens.

    Scale: one narrow per-doc feature pass, one groupBy, one 1-row
    broadcast of the corpus total. Share rounded 6dp."""
    d = table(spark, sf_dir, "documents")
    lab = quality_score(d).select("doc_id", "n_tokens", "quality_label")
    agg = (lab.join(d.select("doc_id", "source"), "doc_id")
           .groupBy("source", "quality_label")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens")))
    tot = lab.agg(F.sum("n_tokens").cast("long").alias("_t"))
    return (agg.crossJoin(F.broadcast(tot))
            .select("source", "quality_label", "n_docs", "total_tokens",
                    F.round(F.col("total_tokens") / F.col("_t"), 6)
                    .alias("token_share")))


@register(
    "report_top_duplicated_chunks",
    oracle=f"""
    WITH {chunks_cte(PARA_W)}
    SELECT chunk,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc_id
    FROM chunks
    GROUP BY chunk
    HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, chunk ASC
    LIMIT 20
    """,
    tags=("llm", "dedup", "report"),
)
def report_top_duplicated_chunks(spark, sf_dir):
    """Top-20 boilerplate report: the most-repeated paragraph chunks
    (same fixed-width chunk unit as `dedup_paragraph_reconstruct`),
    with occurrence count, distinct docs touched, and the first doc —
    the "what exactly is duplicated" list someone eyeballs before
    turning the paragraph-dedup fold loose.

    Scale: chunk relation (narrow) → one groupBy(chunk) → heap top-k
    (orderBy+limit plans as TakeOrderedAndProject — per-partition
    heaps then a 20-row driver merge, never a global sort). Total
    order (count desc, chunk asc) makes the cut deterministic."""
    cr = chunk_relation(table(spark, sf_dir, "documents"))
    return (cr.groupBy("chunk")
            .agg(F.count("*").cast("long").alias("n_occurrences"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("first_doc_id"))
            .filter(F.col("n_occurrences") >= 2)
            .orderBy(F.col("n_occurrences").desc(), F.col("chunk").asc())
            .limit(20))


# ------------------------------------------- wave 2 (r15 candidates)


def _cluster_profile_oracle() -> str:
    cc = REGISTRY["dedup_connected_components"].oracle
    return f"""
    WITH cc AS ({cc}),
    sized AS (
      SELECT cc.component,
             CAST(count(*) AS BIGINT) AS cluster_size,
             CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
      FROM cc JOIN documents d USING (doc_id)
      GROUP BY cc.component)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_source
    FROM sized GROUP BY cluster_size
    """


@register(
    "report_near_dup_cluster_profile",
    oracle=_cluster_profile_oracle(),
    tags=("llm", "dedup", "report"),
)
def report_near_dup_cluster_profile(spark, sf_dir):
    """Near-dup cluster profile: the MinHash-LSH candidate graph's
    connected components (`dedup_connected_components`, composed as a
    relation) sized and checked for source spread — per cluster size:
    how many clusters, how many docs they hold, and how many span
    MORE THAN ONE source (cross-source duplication means syndication /
    scraping overlap; intra-source means boilerplate — they get
    different fixes). The histogram a curation team reads before
    picking a keep rule.

    Scale: everything past the (certified, iterative) components
    kernel is two groupBys; the component relation is bounded by docs
    that appear in at least one candidate pair. The oracle composes
    the CC recursive-CTE fixpoint as a nested WITH — the full
    iterative pipeline stays hash-verified."""
    d = table(spark, sf_dir, "documents")
    cc = dedup_connected_components(spark, sf_dir)
    sized = (cc.join(d.select("doc_id", "source"), "doc_id")
             .groupBy("component")
             .agg(F.count("*").cast("long").alias("cluster_size"),
                  F.countDistinct("source").cast("long")
                  .alias("n_sources")))
    return (sized.groupBy("cluster_size")
            .agg(F.count("*").cast("long").alias("n_clusters"),
                 F.sum("cluster_size").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
                 .cast("long").alias("n_cross_source")))


def _eval_budget_oracle() -> str:
    dc = REGISTRY["decontaminate_minhash"].oracle
    return f"""
    WITH dc AS ({dc}),
    lab AS (
      SELECT doc_id, {_SPLIT_SQL} AS split,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    dropped AS (SELECT test_id FROM dc WHERE is_contaminated)
    SELECT lab.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(lab.n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) - count(dropped.test_id) AS BIGINT)
               AS n_docs_clean,
           CAST(sum(CASE WHEN dropped.test_id IS NULL
                         THEN lab.n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_clean,
           round(sum(CASE WHEN dropped.test_id IS NULL
                          THEN lab.n_tokens ELSE 0 END)
                 * 1.0 / sum(lab.n_tokens), 6) AS token_retention
    FROM lab LEFT JOIN dropped ON dropped.test_id = lab.doc_id
    GROUP BY lab.split
    """


@register(
    "report_decontaminated_eval_budget",
    oracle=_eval_budget_oracle(),
    tags=("llm", "curation", "report"),
)
def report_decontaminated_eval_budget(spark, sf_dir):
    """The eval budget AFTER decontamination: per split, docs and
    tokens before and after dropping the test docs the fuzzy decon
    flags (train/val are never dropped — contamination is defined
    test-against-train). Answers "is my eval set still big enough
    once I remove leakage" BEFORE a training run wastes the benchmark.

    Scale: the decon relation (linear, certified) left-joined on
    doc_id, one groupBy(split). Retention rounded 6dp; counts exact
    integers."""
    d = table(spark, sf_dir, "documents")
    lab = d.select(
        "doc_id", _split_col().alias("split"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    dropped = (decontaminate_minhash(spark, sf_dir)
               .filter(F.col("is_contaminated"))
               .select(F.col("test_id").alias("doc_id"),
                       F.lit(1).alias("_drop")))
    j = lab.join(dropped, "doc_id", "left")
    clean_tokens = F.sum(F.when(F.col("_drop").isNull(),
                                F.col("n_tokens")).otherwise(0))
    return (j.groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 (F.count("*") - F.count("_drop")).cast("long")
                 .alias("n_docs_clean"),
                 clean_tokens.cast("long").alias("tokens_clean"),
                 F.round(clean_tokens / F.sum("n_tokens"), 6)
                 .alias("token_retention")))


@register(
    "report_quality_by_split",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             round(len(list_filter(string_split(text, ' '),
                                   w -> list_contains(['the', 'a'], w)))
                   * 1.0 / len(string_split(text, ' ')), 6)
                 AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))
                   * 1.0 / len(string_split(text, ' ')), 6)
                 AS unique_ratio
      FROM documents),
    lab AS (
      SELECT doc_id,
             CASE WHEN unique_ratio < 0.3 THEN 'low_entropy'
                  WHEN stopword_ratio > 0.2 THEN 'boilerplate'
                  ELSE 'ok' END AS quality_label
      FROM feat),
    sp AS (SELECT doc_id, {_SPLIT_SQL} AS split FROM documents),
    tot AS (SELECT split, CAST(count(*) AS BIGINT) AS n FROM sp
            GROUP BY 1)
    SELECT sp.split, lab.quality_label,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / any_value(tot.n), 6) AS split_share
    FROM sp
    JOIN lab USING (doc_id)
    JOIN tot ON tot.split = sp.split
    GROUP BY sp.split, lab.quality_label
    """,
    tags=("llm", "text", "report"),
)
def report_quality_by_split(spark, sf_dir):
    """Split stratification health check: the quality-label
    distribution inside each hash split, with each cell's share of
    its split — if the test split's label mix diverges from train's,
    the hash split is confounded with quality and eval numbers will
    mislead. Composes the certified quality kernel with the split
    convention; two narrow passes + a 3-row broadcast of split
    totals."""
    d = table(spark, sf_dir, "documents")
    lab = quality_score(d).select("doc_id", "quality_label")
    sp = d.select("doc_id", _split_col().alias("split"))
    tot = sp.groupBy("split").agg(F.count("*").cast("long").alias("_n"))
    return (sp.join(lab, "doc_id")
            .groupBy("split", "quality_label")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .join(F.broadcast(tot), "split")
            .select("split", "quality_label", "n_docs",
                    F.round(F.col("n_docs") / F.col("_n"), 6)
                    .alias("split_share")))
