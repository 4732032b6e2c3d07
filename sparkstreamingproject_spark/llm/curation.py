"""Corpus-curation operators a training-data pipeline runs between raw
ingestion and tokenization: benchmark decontamination, repetition-based
quality signals, PII scrubbing, and incremental (new-batch-vs-corpus)
dedup. Everything is JVM built-ins — codegen at scan speed — except
nothing: there is no Python in any of these paths.

Reference parity note: the reference has no curation surface (it is a
DStream ETL tutorial); these operators extend the engine toward the
LLM-pipeline north star (BASELINE.json), like llm/dedup.py and
llm/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import band_keys, word_shingles

# Redaction patterns — kept to syntax shared by Java regex (Spark) and
# RE2 (DuckDB) so oracle SQL can apply the identical scrub.
EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


def decontaminate(train: DataFrame, test: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_postings: int | None = None) -> DataFrame:
    """Benchmark-contamination report: for every *test* document, how
    much of it appears verbatim (k-word shingles) in the *training*
    corpus — the overlap check every published training run owes its
    eval set.

    Shape at scale: both sides reduce to (id, shingle) and meet in ONE
    shuffle keyed on the shingle — never doc×doc. The train side
    collapses to distinct (shingle, n_train_docs) postings first
    (bounded by vocabulary, not corpus size), so a 100 TB training set
    probes as an index. ``max_postings`` drops stop-shingles (df >
    cap) exactly like jaccard_pairs — a shingle in half the corpus
    signals nothing about contamination but joins against every test
    doc.

    Output: (test_id, n_shared_shingles, n_train_docs,
    contamination_ratio = shared / test-doc shingle count).
    """
    tr = word_shingles(train, id_col, text_col)
    te = word_shingles(test, id_col, text_col)
    postings = (tr.groupBy("shingle")
                .agg(F.countDistinct(id_col).alias("n_train_docs")))
    if max_postings is not None:
        postings = postings.filter(F.col("n_train_docs") <= max_postings)
    hits = (te.join(postings, "shingle")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shared_shingles"),
                 F.max("n_train_docs").alias("max_train_df")))
    sizes = te.groupBy(id_col).agg(F.count("*").alias("n_test_shingles"))
    return (hits.join(sizes, id_col)
            .select(F.col(id_col).alias("test_id"),
                    "n_shared_shingles", "max_train_df",
                    F.round(F.col("n_shared_shingles")
                            / F.col("n_test_shingles"), 6)
                    .alias("contamination_ratio")))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family):
    duplicate-word ratio (1 - unique/total) and top-word fraction
    (most frequent word's share). High values mark boilerplate and
    degenerate generations.

    One explode + two groupBys that share the doc_id shuffle key; the
    (doc, word) aggregate is the word-count relation a tokenizer-stats
    pass produces anyway.
    """
    wc = (df.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("w"))
          .groupBy(id_col, "w").agg(F.count("*").alias("c")))
    return (wc.groupBy(id_col)
            .agg(F.sum("c").alias("n_words"),
                 F.count("*").alias("n_unique"),
                 F.max("c").alias("top_count"))
            .select(id_col,
                    F.col("n_words").cast("long").alias("n_words"),
                    F.round(1 - F.col("n_unique") / F.col("n_words"), 6)
                    .alias("dup_word_ratio"),
                    F.round(F.col("top_count") / F.col("n_words"), 6)
                    .alias("top_word_frac")))


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII redaction: replace emails/phones with typed placeholder
    tokens and count what was removed (the audit trail a compliance
    pass needs). Pure regexp_replace/regexp_extract_all — codegen,
    scan-speed, trivially parallel.

    Output keeps the scrubbed text's md5 rather than the text itself so
    downstream equality checks stay cheap.
    """
    txt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(txt, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"))


def incremental_dedup(existing: DataFrame, incoming: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """New-batch-vs-corpus dedup: keep only incoming documents that are
    neither exact copies (content hash) nor near-duplicates (any
    MinHash-LSH band collision) of the existing corpus — the shape of
    every nightly ingest against a petabyte corpus.

    Two anti-joins, both keyed on precomputable index relations:
    the existing side reduces to distinct content hashes (32 B/row) and
    distinct (band, key) rows; in production both persist between runs
    (partitioned by their key), so an ingest touches the index, never
    the corpus text. The cheap exact-hash filter runs first so the
    MinHash stage hashes only genuinely new content.
    """
    ex_hash = (existing.select(F.md5(F.col(text_col)).alias("h"))
               .distinct())
    inc_hashed = incoming.withColumn("h", F.md5(F.col(text_col)))
    new_exact = inc_hashed.join(ex_hash, "h", "left_anti").drop("h")

    ex_bands = (band_keys(existing, id_col, text_col)
                .select("band", "key").distinct())
    near_hit = (band_keys(new_exact, id_col, text_col)
                .join(ex_bands, ["band", "key"], "left_semi")
                .select(id_col).distinct())
    return new_exact.join(near_hit, id_col, "left_anti")
