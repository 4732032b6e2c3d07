"""Round-5 wave 11: Jensen-Shannon divergence between per-source word
distributions — the symmetric, bounded corpus-comparison metric data-
mixing pipelines use to quantify how different two domains are (PSI's
information-theoretic sibling, over vocabulary instead of bins).

Float discipline: smoothed probabilities are exact rationals whose
double conversion is exactly rounded; each (pair, word) JSD term is
quantized to BIGINT 1e-9 units before the only variable-row-count
aggregation, so pair scores are exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

_JSD_TOP = 10


@register(
    "text_jsd_source_pairs",
    oracle=f"""
    WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
               FROM documents),
    wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
           FROM w WHERE word <> '' GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM wc
            GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS vv FROM wc),
    vocab AS (SELECT DISTINCT word FROM wc),
    grid AS (SELECT tot.source, vocab.word,
                    (coalesce(wc.c, 0) + 1.0) / (tot.t + v.vv) AS p
             FROM tot CROSS JOIN vocab CROSS JOIN v
             LEFT JOIN wc ON wc.source = tot.source
                         AND wc.word = vocab.word),
    pairs AS (SELECT a.source AS sa, b.source AS sb,
                     a.p AS pa, b.p AS pb
              FROM grid a JOIN grid b ON a.word = b.word
                                     AND a.source < b.source),
    terms AS (SELECT sa, sb,
                     CAST(round((0.5 * pa * ln(2 * pa / (pa + pb))
                               + 0.5 * pb * ln(2 * pb / (pa + pb)))
                               * 1e9) AS BIGINT) AS term_e9
              FROM pairs)
    SELECT sa, sb, CAST(sum(term_e9) AS BIGINT) AS jsd_e9
    FROM terms GROUP BY 1, 2
    ORDER BY jsd_e9 DESC, sa, sb LIMIT {_JSD_TOP}
    """,
    tags=("llm", "text", "stats"),
)
def text_jsd_source_pairs(spark, sf_dir):
    """Most-divergent source pairs by Jensen-Shannon divergence over
    add-one-smoothed word distributions. Every relation is bounded by
    sources x vocabulary (the corpus collapses to per-source counts in
    the first aggregation); the pair join is |sources|²/2 x vocab —
    domain-cardinality, not data-cardinality — and JSD terms quantize
    to 1e-9 integer units before summation, so the score is
    bit-identical under any partitioning. Top-k via
    TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    w = (docs.select("source",
                     F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != ""))
    wc = w.groupBy("source", "word").agg(F.count("*").alias("c"))
    tot = wc.groupBy("source").agg(F.sum("c").alias("t"))
    v = wc.agg(F.countDistinct("word").alias("vv"))
    vocab = wc.select("word").distinct()
    grid = (tot.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(v))
            .join(wc, ["source", "word"], "left")
            .select("source", "word",
                    ((F.coalesce("c", F.lit(0)) + 1.0)
                     / (F.col("t") + F.col("vv"))).alias("p")))
    a = grid.select(F.col("source").alias("sa"), "word",
                    F.col("p").alias("pa"))
    b = grid.select(F.col("source").alias("sb"), "word",
                    F.col("p").alias("pb"))
    pairs = a.join(b, "word").filter(F.col("sa") < F.col("sb"))
    term = F.round(
        (0.5 * F.col("pa") * F.log(2 * F.col("pa")
                                   / (F.col("pa") + F.col("pb")))
         + 0.5 * F.col("pb") * F.log(2 * F.col("pb")
                                     / (F.col("pa") + F.col("pb"))))
        * 1e9, 0).cast("bigint")
    return (pairs.select("sa", "sb", term.alias("term_e9"))
            .groupBy("sa", "sb")
            .agg(F.sum("term_e9").alias("jsd_e9"))
            .orderBy(F.desc("jsd_e9"), "sa", "sb").limit(_JSD_TOP))
