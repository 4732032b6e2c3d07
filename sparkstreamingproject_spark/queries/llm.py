"""LLM-data-pipeline queries over ``documents`` / ``embeddings``
(SURVEY.md §7.5 — the extension surface).

The oracle SQL for MinHash/SimHash/LSH is *generated from the same
constants* as the Spark implementation (seeds, band layout, plane
coefficients), so both engines compute the identical deterministic
algorithm — md5 is the shared hash primitive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import dedup as D
from ..llm import similarity as S
from ..llm import textstats as T
from ..llm.multimodal import attach_payload
from .base import register, table

# ---------------------------------------------------------------------------
# shared SQL fragments (generated from the same constants as the Spark side)
# ---------------------------------------------------------------------------

SHINGLES_CTE = f"""
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - {D.SHINGLE_K - 2}, 1)),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
      FROM words)
"""

_MINHASH_AGGS = ",\n           ".join(
    f"min({D.minhash_hex_sql(j)}) AS h{j}" for j in range(D.N_MINHASH))

MINHASH_CTE = f"""
    {SHINGLES_CTE},
    sig AS (
      SELECT doc_id,
           {_MINHASH_AGGS}
      FROM shingles GROUP BY doc_id)
"""

_ROWS = D.N_MINHASH // D.LSH_BANDS
_BAND_SELECTS = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, "
    + " || ".join(f"h{b * _ROWS + r}" for r in range(_ROWS))
    + " AS key FROM sig"
    for b in range(D.LSH_BANDS))


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup(table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS fingerprint
    FROM documents
    """,
    tags=("llm", "dedup"),
)
def text_fingerprint(spark, sf_dir):
    return T.fingerprint(table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {MINHASH_CTE}
    SELECT * FROM sig
    """,
    tags=("llm", "dedup"),
)
def dedup_minhash_signatures(spark, sf_dir):
    return D.minhash_signatures(table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {MINHASH_CTE},
    bands AS (
{_BAND_SELECTS})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                             AND a.doc_id < b.doc_id
    """,
    tags=("llm", "dedup"),
)
def dedup_minhash_lsh(spark, sf_dir):
    return D.lsh_candidate_pairs(table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {SHINGLES_CTE},
    capped AS (
      SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= 50),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN capped USING (shingle)),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i * 1.0 / (ca.c + cb.c - i), 6) AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE round(i * 1.0 / (ca.c + cb.c - i), 6) >= 0.8
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Headline n-gram Jaccard runs CAPPED by default (max_postings=50):
    a shingle shared by >50 docs is a stop-shingle — it contributes
    ~nothing to a 0.8-similarity decision but emits O(df²) candidate
    pairs (10k-doc shingle → 50M pairs from one key), which is the
    scale-killer at corpus size. Both engines compute similarity over
    the identically filtered shingle universe. Uncapped semantics
    remain available via jaccard_pairs(max_postings=None)."""
    return D.jaccard_pairs(table(spark, sf_dir, "documents"),
                           threshold=0.8, max_postings=50)


def _simhash_oracle() -> str:
    bits = D.SIMHASH_BITS
    sums = ",\n             ".join(
        f"sum(2 * ((hv >> {b}) & 1) - 1) AS s{b}" for b in range(bits))
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
                    for b in range(bits))
    return f"""
    WITH w AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 4) AS INTEGER) AS hv
      FROM documents),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM w GROUP BY doc_id)
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums
    """


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("llm", "dedup"))
def dedup_simhash(spark, sf_dir):
    return D.simhash(table(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
    """,
    tags=("llm", "dedup"),
)
def dedup_embedding_cosine(spark, sf_dir):
    return S.embedding_near_dup_pairs(table(spark, sf_dir, "embeddings"), threshold=0.3)


@register(
    "sim_topk_bruteforce",
    oracle="""
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 5)
    WHERE rank <= 5
    """,
    tags=("llm", "similarity"),
)
def sim_topk_bruteforce(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, queries, k=5)


def _lsh_bucket_oracle() -> str:
    planes = S.hyperplanes()
    bits = " || ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"{plane!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes)
    return f"""
    SELECT vec_id, {bits} AS bucket FROM embeddings
    """


@register("sim_ann_lsh_bucket", oracle=_lsh_bucket_oracle(), tags=("llm", "similarity"))
def sim_ann_lsh_bucket(spark, sf_dir):
    """The ANN scale path's bucketing transform (random-hyperplane LSH,
    deterministic planes). Candidate generation + within-bucket top-k is
    exercised in tests/test_llm.py (``lsh_topk``)."""
    emb = table(spark, sf_dir, "embeddings")
    return S.lsh_bucket(emb).select("vec_id", "bucket")


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text, '{T.BPE_ISH_TOKEN_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars,
           round(list_sum(list_transform(string_split(text, ' '), w -> length(w)))
                 * 1.0 / len(string_split(text, ' ')), 4) AS avg_word_len
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_token_count(spark, sf_dir):
    return T.token_stats(table(spark, sf_dir, "documents"))


@register(
    "text_quality_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             round(len(list_filter(string_split(text, ' '),
                                   w -> list_contains(['the', 'a'], w)))
                   * 1.0 / len(string_split(text, ' ')), 6) AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))
                   * 1.0 / len(string_split(text, ' ')), 6) AS unique_ratio
      FROM documents)
    SELECT doc_id, n_tokens, stopword_ratio, unique_ratio,
           CASE WHEN unique_ratio < 0.3 THEN 'low_entropy'
                WHEN stopword_ratio > 0.2 THEN 'boilerplate'
                ELSE 'ok' END AS quality_label
    FROM feat
    """,
    tags=("llm", "text"),
)
def text_quality_score(spark, sf_dir):
    return T.quality_score(table(spark, sf_dir, "documents"))


@register(
    "text_lang_id",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> list_contains(['the', 'a'], w)))
                       * 1.0 / len(string_split(text, ' ')) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS predicted_lang
      FROM documents)
    SELECT doc_id, lang, predicted_lang, predicted_lang = lang AS agree
    FROM feat
    """,
    tags=("llm", "text"),
)
def text_lang_id(spark, sf_dir):
    return T.language_id(table(spark, sf_dir, "documents"))


@register(
    "text_word_freq",
    oracle="""
    SELECT word, count(*) AS n, count(DISTINCT doc_id) AS docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
    tags=("llm", "text", "explode"),
)
def text_word_freq(spark, sf_dir):
    """D1's explode shape over documents: array → rows with parent key
    replicated, then aggregate."""
    return (table(spark, sf_dir, "documents")
            .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("docs")))


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_hash
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_meta(spark, sf_dir):
    """Multimodal metadata path: typed metadata over an opaque binary
    payload — the payload column itself is pruned out of this query's
    scan (only metadata is read). Feature extraction (mapInPandas over
    the binary column) is exercised in tests/test_llm.py."""
    media = attach_payload(table(spark, sf_dir, "documents"))
    return media.select("doc_id", "media_type", "byte_len",
                        F.md5(F.col("payload").cast("string")).alias("content_hash"))


@register(
    "text_search_match",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    hits AS (
      SELECT doc_id, count(*) AS tf, count(DISTINCT word) AS matched_terms
      FROM words WHERE word IN ('spark', 'join', 'fast', 'window')
      GROUP BY doc_id)
    SELECT doc_id, tf, matched_terms
    FROM hits ORDER BY tf DESC, doc_id LIMIT 20
    """,
    tags=("llm", "text", "search"),
)
def text_search_match(spark, sf_dir):
    """Search-style text match (the elasticsearch-dependency surface,
    SURVEY.md §2.I): term-frequency scoring of a query against the
    corpus, top-N. At scale the words relation is a materialized
    inverted index partitioned by term — the query becomes an index
    probe instead of a corpus scan."""
    terms = ["spark", "join", "fast", "window"]
    words = (table(spark, sf_dir, "documents")
             .select("doc_id", F.explode(F.split("text", " ")).alias("word")))
    hits = (words.filter(F.col("word").isin(*terms))
            .groupBy("doc_id")
            .agg(F.count("*").alias("tf"),
                 F.countDistinct("word").alias("matched_terms")))
    return hits.orderBy(F.col("tf").desc(), "doc_id").limit(20)


@register(
    "pandas_grouped_zscore",
    oracle="""
    SELECT event_id, user_id,
           -- + 0.0 canonicalizes IEEE -0.0 (both engines' native
           -- double rounds preserve the sign of a tiny negative, but
           -- the SIGN of a ~1e-17 intermediate can differ between
           -- engines' summation orders; VERDICT r04 class)
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
             + 0.0 AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    tags=("llm", "pandas"),
)
def pandas_grouped_zscore(spark, sf_dir):
    """applyInPandas grouped-map op verified against the SQL window
    formulation — the harness that lets genuinely non-SQL per-group
    Python (model scoring, sklearn transforms) ship with the same
    verification as JVM operators."""
    from ..llm.features import zscore_normalize
    ev = table(spark, sf_dir, "events")
    return zscore_normalize(ev, "user_id", "event_id", "value")


BM25_TERMS = ["spark", "join", "fast", "window"]


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT count(*) AS n_docs, (SELECT avg(dl) FROM dl) AS avgdl FROM documents),
    tf AS (
      SELECT doc_id, word, count(*) AS tf FROM words
      WHERE word IN ({terms}) GROUP BY 1, 2),
    dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * (1.2 + 1))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS term_score
      FROM tf
      JOIN dfreq USING (word)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats)
    SELECT doc_id, round(sum(term_score), 4) AS bm25
    FROM scored GROUP BY doc_id
    """


@register("text_search_bm25", oracle=_bm25_oracle(), tags=("llm", "text", "search"))
def text_search_bm25(spark, sf_dir):
    """Okapi BM25 relevance scoring (the full-text-search surface the
    reference's elasticsearch dependency implies)."""
    return T.bm25_scores(table(spark, sf_dir, "documents"), BM25_TERMS)


@register(
    "dedup_connected_components",
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
      SELECT e.v, walk.label FROM walk JOIN e ON e.u = walk.u)
    SELECT u AS doc_id, min(label) AS component FROM walk GROUP BY u
    """,
    tags=("llm", "dedup", "graph"),
)
def dedup_connected_components(spark, sf_dir):
    """Near-dup cluster canonicalization: connected components over the
    MinHash-LSH candidate-pair graph; every clustered document maps to
    its component's minimum doc_id ("keep doc_id == component" dedups
    the corpus). Spark runs iterative min-label propagation
    (llm/dedup.py:connected_components — O(diameter) self-join rounds,
    lineage cut per round); the oracle computes the same fixpoint with
    a DuckDB recursive CTE, so even this iterative operator is
    hash-verified, not rows-only."""
    pairs = D.lsh_candidate_pairs(table(spark, sf_dir, "documents"))
    cc = D.connected_components(pairs)
    return cc.select(F.col("u").alias("doc_id"),
                     F.col("label").alias("component"))


def _lsh_or_oracle() -> str:
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
    WITH b AS ({union})
    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
    FROM b x JOIN b y
      ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    """


@register("sim_ann_lsh_or_pairs", oracle=_lsh_or_oracle(),
          tags=("llm", "similarity"))
def sim_ann_lsh_or_pairs(spark, sf_dir):
    """OR-amplified LSH candidate pairs (3 tables × 10 hyperplanes):
    recall rises as 1-(1-p)^T while per-table buckets stay small — the
    tunable scale knob for ANN at 100 TB. Recall vs the brute-force
    neighbor set is asserted in tests/test_llm.py."""
    emb = table(spark, sf_dir, "embeddings")
    return S.lsh_multi_table_pairs(emb)


@register(
    "curation_pipeline",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang, n_chars, text,
             round(len(list_distinct(string_split(text, ' ')))
                   * 1.0 / len(string_split(text, ' ')), 6) AS unique_ratio,
             round(len(list_filter(string_split(text, ' '),
                                   w -> list_contains(['the', 'a'], w)))
                   * 1.0 / len(string_split(text, ' ')), 6) AS stopword_ratio
      FROM documents),
    keep AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS b
      FROM feat
      WHERE unique_ratio >= 0.3 AND stopword_ratio <= 0.2
        AND doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))),
    split AS (
      SELECT lang,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             n_chars
      FROM keep)
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM split GROUP BY split, lang
    """,
    tags=("llm", "pipeline"),
)
def curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation — the composition the individual
    operators exist for: quality gate (entropy + stopword heuristics)
    → exact-dedup keep-list (min doc_id per content hash, broadcast
    semi join) → deterministic 80/10/10 split by id hash → per
    (split, lang) corpus stats. Every stage is map-side except the
    dedup keep-list (one hash-keyed shuffle) and the final small agg;
    the whole pipeline is one linear scan of the corpus at 100 TB.
    Composes quality_score (llm/textstats.py), exact_dedup
    (llm/dedup.py), and the split bucketing (queries/sketches.py)."""
    d = table(spark, sf_dir, "documents")
    q = T.quality_score(d).filter(
        (F.col("unique_ratio") >= 0.3) & (F.col("stopword_ratio") <= 0.2))
    keep = (D.exact_dedup(d).select(F.col("keep_id").alias("doc_id")))
    b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long") % 100)
    split = (F.when(b < 80, "train").when(b < 90, "val").otherwise("test"))
    return (d.join(q.select("doc_id"), "doc_id", "left_semi")
            .join(keep, "doc_id", "left_semi")
            .groupBy(split.alias("split"), "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


@register(
    "dedup_jaccard_capped",
    oracle=f"""
    WITH {SHINGLES_CTE},
    capped AS (
      SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= 5),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN capped USING (shingle)),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i * 1.0 / (ca.c + cb.c - i), 6) AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE round(i * 1.0 / (ca.c + cb.c - i), 6) >= 0.5
    """,
    tags=("llm", "dedup"),
)
def dedup_jaccard_capped(spark, sf_dir):
    """DF-capped Jaccard: shingles shared by more than 5 docs are
    dropped before pair generation — the stop-shingle guard that bounds
    the per-key quadratic pair blow-up at corpus scale (llm/dedup.py:
    jaccard_pairs(max_postings=...)). Similarity is computed over the
    filtered shingle universe on BOTH engines, so the capped scores
    hash-match."""
    return D.jaccard_pairs(table(spark, sf_dir, "documents"),
                           threshold=0.5, max_postings=5)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, n_frames, i * {4} AS frame_idx,
           i * {4 * 40} AS byte_offset
    FROM (
      SELECT doc_id, n_frames,
             unnest(range(0, CASE WHEN n_frames <= 0 THEN 0
                                  ELSE (n_frames - 1) // {4} + 1 END)) AS i
      FROM (SELECT doc_id, octet_length(encode(text)) // {40} AS n_frames
            FROM documents))
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plan over media payloads (every 4th frame of
    40-byte frames): emits (frame_idx, byte_offset) fetch rows from
    metadata ONLY — the payload column is pruned from the scan, which
    is how a 100 TB video corpus schedules decode work without reading
    bytes. Decode itself is the mapInPandas stub
    (llm/multimodal.py:decode_stub_features)."""
    from ..llm.multimodal import attach_payload, frame_sample_plan
    d = attach_payload(table(spark, sf_dir, "documents"))
    return frame_sample_plan(d).select(
        "doc_id", "n_frames",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"))
