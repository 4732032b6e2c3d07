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

from pyspark.sql import DataFrame, Window
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


def pack_sequences(df: DataFrame, window_tokens: int = 128,
                   n_buckets: int = 32, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Contiguous sequence packing — the GPT-pretraining layout step:
    concatenate documents and slice into fixed token windows; each doc
    learns which window (bin) it starts in and at what token offset.

    Scale shape: a GLOBAL concatenation order would serialize into one
    task, so docs are first hash-bucketed (deterministic md5 bucket);
    packing is per-bucket — ``n_buckets`` independent streams, each a
    partition-local running sum (window over the bucket, ordered by
    doc id). That is how a 1000-executor packer actually runs: bucket
    = worker stream, and bin ids are (bucket, local_bin).

    Output: (doc_id, bucket, n_tokens, bin_id, bin_offset).
    """
    bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                     16, 10).cast("long") % n_buckets)
    t = df.select(F.col(id_col),
                  bucket.alias("bucket"),
                  F.size(F.split(F.col(text_col), " ")).cast("long")
                  .alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return t.select(
        id_col, "bucket", "n_tokens",
        F.floor(start / window_tokens).cast("long").alias("bin_id"),
        (start % window_tokens).cast("long").alias("bin_offset"))


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Shannon entropy of the character distribution per document — the
    cheap perplexity proxy: natural text sits in a narrow entropy band;
    binary-ish/degenerate content falls outside it.

    Explode-to-chars is deliberate: it keeps the whole computation in
    codegen (split/explode/groupBy/log2) with map-side partial counts.
    The (doc, char) relation is ≤ alphabet-size rows per doc after the
    partial aggregate — far smaller than the text it came from by the
    time it shuffles.
    """
    chars = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), "")).alias("c"))
             .filter(F.col("c") != "")
             .groupBy(id_col, "c").agg(F.count("*").alias("n")))
    tot = F.sum("n")
    # H = log2(N) - Σ n·log2(n) / N  (algebraic form: one pass, no
    # per-row p=n/N division before the aggregate)
    return (chars.groupBy(id_col)
            .agg(F.round(
                F.log2(tot) - F.sum(F.col("n") * F.log2("n")) / tot, 6)
                .alias("char_entropy"),
                tot.cast("long").alias("n_chars_counted")))


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


def shard_by_token_budget(docs: DataFrame, budget: int,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Assign every document to a training shard so that shards are
    contiguous runs of a deterministic global shuffle order and each
    holds ~``budget`` tokens — the write-side step that turns a curated
    corpus into balanced, reproducible training files.

    Order is (md5(id), id): a seeded uniform shuffle that any engine
    reproduces; shard = exclusive-prefix-sum(tokens) // budget, so a
    document's shard depends only on the corpus content, never on
    partitioning or retries.

    Scale shape: a naive ``sum() OVER (ORDER BY ...)`` collapses to a
    single partition at 100 TB. Instead the prefix sum is two-phase:
    split the hash order into 16 ranges on the first hex digit (a
    prefix of the sort key, so ranges are order-contiguous), take
    per-range token totals (16-row relation), turn them into exclusive
    range offsets with a window over those 16 rows, broadcast the
    offsets back, and run the within-range cumulative sum as a window
    PARTITIONED by range — 16-way parallel, and in production the
    range count is a knob (e.g. first 3 hex digits = 4096 ranges).
    All arithmetic is integer — exact under any partitioning.

    Returns (id, ntok, h, shard).
    """
    toks = docs.select(F.col(id_col),
                       F.size(F.filter(F.split(F.col(text_col), " "),
                                       lambda w: w != ""))
                       .cast("bigint").alias("ntok"))
    return shard_by_weight(toks, "ntok", budget, id_col=id_col)


def shard_by_weight(rows: DataFrame, weight_col: str, budget: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Generalized budget sharding: ``rows`` already carries an integer
    ``weight_col`` (tokens, payload bytes, frame counts — anything
    additive); shard = exclusive-prefix-sum(weight) // budget over the
    deterministic (md5(id), id) shuffle order, with the same two-phase
    16-range prefix sum as ``shard_by_token_budget`` (whose docstring
    states the scale argument). Returns (id, weight_col, h, shard)."""
    h = F.md5(F.col(id_col).cast("string"))
    toks = (rows.select(F.col(id_col),
                        F.col(weight_col).cast("bigint").alias("ntok"))
            .withColumn("h", h)
            .withColumn("rng", F.substring("h", 1, 1)))
    per_range = (toks.groupBy("rng").agg(F.sum("ntok").alias("rt")))
    offsets = per_range.select(
        "rng",
        (F.sum("rt").over(
            Window.partitionBy(F.lit(1)).orderBy("rng")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
         - F.col("rt")).alias("off"))
    cum = (toks.join(F.broadcast(offsets), "rng")
           .withColumn(
               "cum_excl",
               F.col("off")
               + F.sum("ntok").over(
                   Window.partitionBy("rng").orderBy("h", id_col)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
               - F.col("ntok")))
    return cum.select(id_col, F.col("ntok").alias(weight_col), "h",
                      F.expr(f"cum_excl div {int(budget)}")
                      .cast("int").alias("shard"))


def write_token_shards(docs: DataFrame, budget: int, path: str,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> int:
    """Materialize the token-budget sharding as one parquet file per
    shard directory — the actual write step of a training-data
    pipeline (balanced, reproducible input files for the trainer).

    ``repartition(shard)`` routes each shard to exactly one task, so
    ``partitionBy(shard)`` emits exactly one file per shard directory;
    at cluster scale that is one writer task per shard, all parallel.
    Returns the number of shards written.
    """
    assignments = shard_by_token_budget(docs, budget, text_col, id_col)
    out = docs.join(assignments.select(id_col, "shard"), id_col)
    (out.repartition("shard")
        .write.mode("overwrite").partitionBy("shard").parquet(path))
    # count shards from the WRITTEN output (partition-column listing —
    # metadata-cheap), not by re-running the whole assignment lineage
    spark = docs.sparkSession
    return (spark.read.parquet(path)
            .select("shard").distinct().count())
