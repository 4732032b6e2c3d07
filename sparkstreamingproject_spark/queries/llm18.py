"""Round-11 LLM wave 4: MinHash-LSH FUZZY decontamination and
corpus-adaptive stopword discovery.

`decontaminate_ngram` (llm2.py) catches exact shingle overlap between
a training split and a benchmark split — the exact-match half of the
standard decontamination recipe. Real leakage is usually PARAPHRASED
(whitespace, casing, light edits), which exact shingles miss: the
fuzzy half probes the benchmark's MinHash band keys against the
training side's band index and exact-verifies candidates with true
Jaccard — precisely the machinery the dedup family certifies, pointed
across splits instead of within one corpus.

Stopword discovery closes a loop the text family assumes: BM25/TF-IDF
and the posting-list kernels all benefit from dropping
corpus-specific stopwords ("the" of THIS corpus, not a frozen English
list — code corpora stop on "return", legal corpora on "herein").
Document-frequency ratio + cross-source evenness (entropy) identify
them from the data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table
from .llm import MINHASH_CTE, SHINGLES_CTE, _BAND_SELECTS
from .llm2 import _BUCKET_SQL, _bucket_col

# ------------------------------------- MinHash fuzzy decontamination

_DC_TAU = 0.5


@register(
    "decontaminate_minhash",
    oracle=f"""
    WITH {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS}),
    bk AS (SELECT doc_id, {_BUCKET_SQL} AS bk FROM documents),
    cand AS (
      SELECT DISTINCT te.doc_id AS test_id, tr.doc_id AS train_id
      FROM bands te
      JOIN bk bte ON bte.doc_id = te.doc_id AND bte.bk >= 90
      JOIN bands tr ON tr.band = te.band AND tr.key = te.key
      JOIN bk btr ON btr.doc_id = tr.doc_id AND btr.bk < 80),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           FROM shingles GROUP BY 1),
    inter AS (
      SELECT c.test_id, c.train_id, CAST(count(*) AS BIGINT) AS i
      FROM cand c
      JOIN shingles a ON a.doc_id = c.test_id
      JOIN shingles b ON b.doc_id = c.train_id
                     AND b.shingle = a.shingle
      GROUP BY 1, 2),
    jac AS (
      SELECT c.test_id, c.train_id,
             round(coalesce(i.i, 0) * 1.0
                   / (sa.n + sb.n - coalesce(i.i, 0)), 6) AS j
      FROM cand c
      JOIN sz sa ON sa.doc_id = c.test_id
      JOIN sz sb ON sb.doc_id = c.train_id
      LEFT JOIN inter i ON i.test_id = c.test_id
                       AND i.train_id = c.train_id)
    SELECT test_id,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN j >= {_DC_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_confirmed,
           max(j) AS max_jaccard,
           max(j) >= {_DC_TAU} AS is_contaminated
    FROM jac GROUP BY test_id
    """,
    tags=("llm", "curation", "dedup"),
)
def decontaminate_minhash(spark, sf_dir):
    """FUZZY benchmark decontamination: the test split's MinHash band
    keys probe the train split's band index; banded collisions are
    exact-verified with true shingle Jaccard and a test doc is flagged
    when any training doc matches at ≥ {_DC_TAU}. The near-dup
    counterpart of `decontaminate_ngram` (which requires exact shingle
    hits): paraphrased leakage collides in a band with the usual
    MinHash probability even when many individual shingles differ.

    Scale: the train side persists as the SAME (band, key) index the
    incremental-dedup fold maintains; probing is band-keyed (never
    test×train), verification touches only candidates' shingles —
    identical posture to `dedup_lsh_verified`, across splits. Counts
    integer; Jaccard rounded 6dp before the threshold."""
    d = table(spark, sf_dir, "documents")
    bkc = _bucket_col()
    bands = D.band_keys(d)
    bk = d.select("doc_id", bkc.alias("bk"))
    te = (bands.join(bk, "doc_id").filter(F.col("bk") >= 90)
          .select(F.col("doc_id").alias("test_id"), "band", "key"))
    tr = (bands.join(bk, "doc_id").filter(F.col("bk") < 80)
          .select(F.col("doc_id").alias("train_id"), "band", "key"))
    cand = te.join(tr, ["band", "key"]).select("test_id",
                                               "train_id").distinct()
    sh = D.word_shingles(d, distinct=True)
    sz = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    inter = (cand
             .join(sh.select(F.col("doc_id").alias("test_id"), "shingle"),
                   "test_id")
             .join(sh.select(F.col("doc_id").alias("train_id"),
                             "shingle"), ["train_id", "shingle"])
             .groupBy("test_id", "train_id")
             .agg(F.count("*").cast("long").alias("i")))
    jac = (cand
           .join(sz.select(F.col("doc_id").alias("test_id"),
                           F.col("n").alias("na")), "test_id")
           .join(sz.select(F.col("doc_id").alias("train_id"),
                           F.col("n").alias("nb")), "train_id")
           .join(inter, ["test_id", "train_id"], "left")
           .select("test_id",
                   F.round(F.coalesce("i", F.lit(0))
                           / (F.col("na") + F.col("nb")
                              - F.coalesce("i", F.lit(0))), 6)
                   .alias("j")))
    return (jac.groupBy("test_id")
            .agg(F.count("*").cast("long").alias("n_candidates"),
                 F.sum(F.when(F.col("j") >= _DC_TAU, 1).otherwise(0))
                 .cast("long").alias("n_confirmed"),
                 F.max("j").alias("max_jaccard"))
            .select("test_id", "n_candidates", "n_confirmed",
                    "max_jaccard",
                    (F.col("max_jaccard") >= _DC_TAU)
                    .alias("is_contaminated")))


# ------------------------------------------- stopword discovery

_SW_DF = 0.5


@register(
    "text_stopword_discovery",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    dfreq AS (
      SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM w WHERE word <> '' GROUP BY word),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(DISTINCT source) AS BIGINT) AS all_sources
          FROM documents),
    sc AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1, 2),
    wt AS (SELECT word, CAST(sum(c) AS BIGINT) AS tot FROM sc
           GROUP BY word),
    ent AS (
      SELECT sc.word,
             round(-sum((sc.c * 1.0 / wt.tot)
                        * ln(sc.c * 1.0 / wt.tot)), 4) AS src_entropy
      FROM sc JOIN wt ON wt.word = sc.word GROUP BY sc.word)
    SELECT d.word, d.df,
           round(d.df * 1.0 / n.n_docs, 6) AS doc_frac,
           d.n_sources, ent.src_entropy,
           d.n_sources = n.all_sources AS in_all_sources
    FROM dfreq d JOIN ent ON ent.word = d.word CROSS JOIN n
    WHERE d.df * 1.0 / n.n_docs >= {_SW_DF}
    """,
    tags=("llm", "text"),
)
def text_stopword_discovery(spark, sf_dir):
    """Corpus-ADAPTIVE stopword discovery: words appearing in ≥
    {int(_SW_DF * 100)}% of documents, with their cross-source count
    entropy and an all-sources presence flag — the data-derived stop
    list BM25/TF-IDF/posting-list kernels should drop instead of a
    frozen English list (a code corpus stops on 'return', a legal
    corpus on 'herein'; high entropy = evenly spread = a true
    function word, low entropy = one source's boilerplate, which is a
    BOILERPLATE signal, not a stopword). Exact integer df/source
    counts; the entropy is a per-word fixed-arity tree over ≤
    |sources| terms, rounded 4dp. Scale: two (word)-keyed aggregates;
    output bounded by the df threshold, not the vocabulary."""
    d = table(spark, sf_dir, "documents")
    w = (d.select("doc_id", "source",
                  F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != ""))
    dfreq = w.groupBy("word").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.countDistinct("source").cast("long").alias("n_sources"))
    n = d.agg(F.count("*").cast("long").alias("n_docs"),
              F.countDistinct("source").cast("long").alias("all_sources"))
    sc = (w.groupBy("source", "word")
          .agg(F.count("*").cast("long").alias("c")))
    wt = sc.groupBy("word").agg(F.sum("c").cast("long").alias("tot"))
    p = F.col("c") / F.col("tot")
    ent = (sc.join(wt, "word")
           .groupBy("word")
           .agg(F.round(-F.sum(p * F.log(p)), 4).alias("src_entropy")))
    return (dfreq.join(ent, "word").crossJoin(F.broadcast(n))
            .filter(F.col("df") / F.col("n_docs") >= _SW_DF)
            .select("word", "df",
                    F.round(F.col("df") / F.col("n_docs"), 6)
                    .alias("doc_frac"),
                    "n_sources", "src_entropy",
                    (F.col("n_sources") == F.col("all_sources"))
                    .alias("in_all_sources")))
