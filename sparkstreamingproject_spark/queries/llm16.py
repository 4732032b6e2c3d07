"""Round-11 LLM wave 2: readability scoring, Dunning log-likelihood
keyness, frequency-based extractive selection (SumBasic), soft dedup
weighting, and hapax-ratio lexical profiling.

These close out the standard text-curation scorer set next to the
existing quality/lang-ID/repetition/keyness family: Flesch-Kincaid is
the readability gate every web-corpus pipeline runs, Dunning's G² is
the collocation/keyness statistic the chi-square form approximates
(Dunning 1993 — `text_chi2_keyness` deliberately kept libm-free; this
is the ln-based original, rounded like the BM25/idf float trees),
SumBasic (Nenkova & Vanderwende 2005) is the frequency-only extractive
summarizer, SoftDeDup (she et al. 2024-style reweight-don't-remove) is
the loss-weighting alternative to dropping duplicates, and hapax ratio
is the classic lexical-richness diagnostic beside Heaps'-law and MSTTR.

Float discipline: every score is one fixed-arity float expression over
exact integer aggregates, rounded identically in both engines before
any ranking. No per-row float accumulation crosses a partition
boundary except through exact-integer sums.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

# -------------------------------------------------- readability (FK)

_SYL = "[aeiouy]+"


@register(
    "text_readability_fk",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    syl AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(greatest(1, len(regexp_extract_all(word,
                    '{_SYL}')))) AS BIGINT) AS n_syll
      FROM w WHERE word <> '' GROUP BY source),
    d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source)
    SELECT d.source, d.n_docs, syl.n_words, syl.n_syll,
           round(0.39 * (CAST(syl.n_words AS DOUBLE) / d.n_docs)
                 + 11.8 * (CAST(syl.n_syll AS DOUBLE) / syl.n_words)
                 - 15.59, 4) AS fk_grade
    FROM d JOIN syl USING (source)
    """,
    tags=("llm", "text"),
)
def text_readability_fk(spark, sf_dir):
    """Flesch-Kincaid grade level per source — the readability gate in
    every web-corpus curation pipeline (C4/Gopher-style quality rules
    carry a words-per-sentence term; this is the canonical scored
    form). Syllables are vowel-group runs (min 1 per word) counted by
    one regexp inside the scan projection; the synthetic corpus has no
    sentence punctuation, so the sentence unit is the document (the
    formula's words/sentences term becomes words/doc). The grade is
    ONE fixed-arity float over three exact BIGINT aggregates
    (n_docs, n_words, n_syll), rounded 4dp — nothing float crosses a
    shuffle. Scale: a map-side word explode into a source-keyed
    aggregate; output rows = |sources|."""
    docs = table(spark, sf_dir, "documents")
    w = (docs.select("source", F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != ""))
    syl = w.groupBy("source").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.greatest(F.lit(1), F.expr(
            f"size(regexp_extract_all(word, '{_SYL}', 0))")))
        .cast("long").alias("n_syll"))
    d = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    grade = (0.39 * (F.col("n_words").cast("double") / F.col("n_docs"))
             + 11.8 * (F.col("n_syll").cast("double") / F.col("n_words"))
             - 15.59)
    return (d.join(syl, "source")
            .select("source", "n_docs", "n_words", "n_syll",
                    F.round(grade, 4).alias("fk_grade")))


# ------------------------------------------- Dunning G-squared keyness

_G2_TOP = 5


@register(
    "text_gtest_keyness",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    wc AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS a
      FROM w WHERE word <> '' GROUP BY 1, 2),
    st AS (SELECT source, CAST(sum(a) AS BIGINT) AS src_total
           FROM wc GROUP BY source),
    gt AS (SELECT word, CAST(sum(a) AS BIGINT) AS word_total FROM wc
           GROUP BY word),
    n AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM wc),
    cells AS (
      SELECT wc.source, wc.word, wc.a, st.src_total, gt.word_total, n.nn,
             gt.word_total - wc.a AS b,
             st.src_total - wc.a AS c,
             n.nn - gt.word_total - st.src_total + wc.a AS d
      FROM wc JOIN st USING (source) JOIN gt USING (word) CROSS JOIN n),
    scored AS (
      SELECT source, word,
             round(2.0 * (
               CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * nn
                 / (CAST(src_total AS DOUBLE) * word_total)) ELSE 0 END
             + CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE) * nn
                 / (CAST(nn - src_total AS DOUBLE) * word_total)) ELSE 0 END
             + CASE WHEN c > 0 THEN c * ln(CAST(c AS DOUBLE) * nn
                 / (CAST(src_total AS DOUBLE) * (nn - word_total))) ELSE 0 END
             + CASE WHEN d > 0 THEN d * ln(CAST(d AS DOUBLE) * nn
                 / (CAST(nn - src_total AS DOUBLE) * (nn - word_total)))
               ELSE 0 END), 4) AS g2
      FROM cells
      WHERE CAST(a AS DOUBLE) * nn
            > CAST(src_total AS DOUBLE) * word_total),
    ranked AS (
      SELECT source, word, g2,
             row_number() OVER (PARTITION BY source
                                ORDER BY g2 DESC, word) AS rnk
      FROM scored)
    SELECT source, word, g2, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_G2_TOP}
    """,
    tags=("llm", "text", "stat"),
)
def text_gtest_keyness(spark, sf_dir):
    """Dunning log-likelihood (G²) keyness: the top-5 words most
    over-represented in each source vs the rest of the corpus (Dunning
    1993 — the statistic corpus linguistics actually recommends over
    chi-square for sparse counts; `text_chi2_keyness` is the libm-free
    sibling). Cells a/b/c/d are exact integer counts from one
    (source, word) aggregate + two marginals; G² = 2·Σ O·ln(O·N/RC) is
    one fixed-arity float tree per word (≤4 ln calls over integer
    ratios), rounded 4dp BEFORE ranking so the two engines rank
    identical values. Over-represented only (a·N > R·C), ties by word.
    Scale: marginals are |sources| and |vocab| rows — the word-keyed
    join shuffles digest-sized rows, source totals broadcast."""
    docs = table(spark, sf_dir, "documents")
    wc = (docs.select("source",
                      F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("source", "word")
          .agg(F.count("*").cast("long").alias("a")))
    st = wc.groupBy("source").agg(F.sum("a").cast("long").alias("src_total"))
    gt = wc.groupBy("word").agg(F.sum("a").cast("long").alias("word_total"))
    n = wc.agg(F.sum("a").cast("long").alias("nn"))
    cells = (wc.join(F.broadcast(st), "source").join(gt, "word")
             .crossJoin(F.broadcast(n))
             .withColumn("b", F.col("word_total") - F.col("a"))
             .withColumn("c", F.col("src_total") - F.col("a"))
             .withColumn("d", F.col("nn") - F.col("word_total")
                         - F.col("src_total") + F.col("a")))

    def term(o, row_tot, col_tot):
        return F.when(o > 0, o * F.log(
            o.cast("double") * F.col("nn")
            / (row_tot.cast("double") * col_tot))).otherwise(F.lit(0.0))

    g2 = 2.0 * (
        term(F.col("a"), F.col("src_total"), F.col("word_total"))
        + term(F.col("b"), F.col("nn") - F.col("src_total"),
               F.col("word_total"))
        + term(F.col("c"), F.col("src_total"),
               F.col("nn") - F.col("word_total"))
        + term(F.col("d"), F.col("nn") - F.col("src_total"),
               F.col("nn") - F.col("word_total")))
    scored = (cells.filter(F.col("a").cast("double") * F.col("nn")
                           > F.col("src_total").cast("double")
                           * F.col("word_total"))
              .select("source", "word", F.round(g2, 4).alias("g2")))
    w = Window.partitionBy("source").orderBy(F.col("g2").desc(), "word")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _G2_TOP)
            .select("source", "word", "g2",
                    F.col("rnk").cast("int").alias("rnk")))


# ------------------------------------------ SumBasic extractive select

_SB_CHUNK = 8


@register(
    "text_sumbasic_extract",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unnest(ws) AS word,
             unnest(range(len(ws))) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents)),
    cf AS (SELECT word, CAST(count(*) AS BIGINT) AS cw
           FROM w WHERE word <> '' GROUP BY word),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total
            FROM w WHERE word <> ''),
    ch AS (
      SELECT w.doc_id, w.pos // {_SB_CHUNK} AS chunk_id,
             CAST(sum(cf.cw) AS BIGINT) AS freq_mass,
             CAST(count(*) AS BIGINT) AS chunk_len
      FROM w JOIN cf USING (word)
      WHERE w.word <> ''
      GROUP BY 1, 2),
    scored AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_len,
             round(CAST(freq_mass AS DOUBLE)
                   / (chunk_len * tot.total), 6) AS score
      FROM ch CROSS JOIN tot),
    best AS (
      SELECT doc_id, chunk_id, chunk_len, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, chunk_id) AS rn
      FROM scored)
    SELECT doc_id, chunk_id, chunk_len, score
    FROM best WHERE rn = 1
    """,
    tags=("llm", "text"),
)
def text_sumbasic_extract(spark, sf_dir):
    """SumBasic-style frequency-only extractive selection (Nenkova &
    Vanderwende 2005): for each document, the {_SB_CHUNK}-token window
    whose average corpus word probability is highest — the zero-model
    summarizer / highlight picker that needs only a word-count table.
    The per-chunk score is Σ count(w) / (len · total): exact BIGINT
    frequency mass divided once at the end, rounded 6dp BEFORE the
    per-doc argmax so rank order is engine-identical (ties → lowest
    chunk_id). Scale: word→count join is vocab-keyed; the only
    per-document state is one {_SB_CHUNK}-token window id — no text
    bodies shuffle, and the corpus total is a 1-row broadcast."""
    docs = table(spark, sf_dir, "documents")
    w = (docs.select("doc_id", F.posexplode(F.split("text", " "))
                     .alias("pos", "word"))
         .filter(F.col("word") != ""))
    cf = w.groupBy("word").agg(F.count("*").cast("long").alias("cw"))
    tot = w.agg(F.count("*").cast("long").alias("total"))
    ch = (w.join(cf, "word")
          .groupBy("doc_id",
                   F.expr(f"pos div {_SB_CHUNK}").alias("chunk_id"))
          .agg(F.sum("cw").cast("long").alias("freq_mass"),
               F.count("*").cast("long").alias("chunk_len")))
    scored = (ch.crossJoin(F.broadcast(tot))
              .select("doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"),
                      "chunk_len",
                      F.round(F.col("freq_mass").cast("double")
                              / (F.col("chunk_len") * F.col("total")), 6)
                      .alias("score")))
    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                               "chunk_id")
    return (scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("doc_id", "chunk_id", "chunk_len", "score"))


# --------------------------------------------------- soft dedup weight

@register(
    "dedup_soft_weight",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
      FROM documents),
    sized AS (
      SELECT doc_id, h,
             CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS cluster_n
      FROM canon)
    SELECT doc_id, cluster_n,
           round(1.0 / cluster_n, 6) AS weight
    FROM sized
    """,
    tags=("llm", "dedup"),
)
def dedup_soft_weight(spark, sf_dir):
    """Soft dedup: REWEIGHT duplicates instead of dropping them — each
    doc gets training weight 1/|cluster| so every content cluster
    contributes one unit of loss mass regardless of copy count (the
    SoftDeDup alternative to `dedup_normalized_exact`'s hard keep/drop;
    downsampling-by-weight preserves rare-phrasing variants hard
    removal discards). Clusters come from the same
    canonicalize-then-md5 normalizer, so the two queries agree on
    cluster membership by construction. Weight = 1/count is one float
    div over an exact window count, rounded 6dp. Scale: one
    digest-keyed window — shuffles 32-byte hashes, never bodies."""
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "))
    h = Window.partitionBy(F.md5(norm))
    cluster_n = F.count("*").over(h).cast("long")
    return docs.select(
        "doc_id", cluster_n.alias("cluster_n"),
        F.round(F.lit(1.0) / cluster_n, 6).alias("weight"))


# ------------------------------------------------------ hapax richness

@register(
    "text_hapax_ratio",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    wc AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_ratio
    FROM wc GROUP BY source
    """,
    tags=("llm", "text"),
)
def text_hapax_ratio(spark, sf_dir):
    """Hapax legomenon ratio per source: the share of the vocabulary
    that occurs exactly once — the classic lexical-richness diagnostic
    beside `text_heaps_law` (vocabulary growth) and
    `text_msttr_diversity` (windowed TTR). A low hapax ratio flags
    template/boilerplate-heavy sources; a high one flags noisy or
    OCR-damaged text — both curation signals. Two exact-integer
    aggregates ((source, word) counts, then per-source vocab/hapax)
    and one terminal rounded division. Scale: the same
    (source, word)-keyed shuffle as the keyness queries; output rows =
    |sources|."""
    docs = table(spark, sf_dir, "documents")
    wc = (docs.select("source",
                      F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("source", "word")
          .agg(F.count("*").cast("long").alias("c")))
    return (wc.groupBy("source")
            .agg(F.count("*").cast("long").alias("vocab"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("long").alias("hapax"))
            .select("source", "vocab", "hapax",
                    F.round(F.col("hapax").cast("double") / F.col("vocab"),
                            6).alias("hapax_ratio")))
