"""Round-10 LLM wave: LSH-Ensemble size-partitioned containment index
(VERDICT r09 §next 3 — the one scoped-but-deferred r9 item).

The oracle replicates the exact deterministic pipeline (md5-slice
MinHash, bit-width size partitions, gap-bounded probing, stop-bucket
cap, exact verify) so DuckDB certifies candidate generation AND
verification, not just the final containment arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table
from .llm import SHINGLES_CTE
from .llm import BM25_TERMS as T_BM25_TERMS
from .llm2 import _bands_sql, _shingles_sql

_MC_AGREE = " + ".join(
    f"(CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END)"
    for j in range(D.N_MINHASH))

# one min-agg per hash, generated from the same constants as Spark
_LSHE_MINS = ",\n           ".join(
    f"min({D.minhash_hex_sql(j)}) AS h{j}" for j in range(D.LSHE_N_HASHES))
_LSHE_HLIST = "[" + ", ".join(f"h{j}" for j in range(D.LSHE_N_HASHES)) + "]"


@register(
    "dedup_containment_lsh_ensemble",
    oracle=f"""
    WITH {SHINGLES_CTE.strip().rstrip(',')},
    sh AS MATERIALIZED (SELECT doc_id, shingle FROM shingles),
    sig AS MATERIALIZED (
      SELECT doc_id, count(*) AS c,
           {_LSHE_MINS}
      FROM sh GROUP BY doc_id),
    part AS (
      SELECT *, CAST(length(to_base(c, 2)) - 1 AS INT) AS p FROM sig),
    k AS MATERIALIZED (
      SELECT doc_id, j.j AS j, {_LSHE_HLIST}[j.j + 1] AS h,
             p + s.s AS q
      FROM part
      CROSS JOIN (SELECT unnest(range(0, {D.LSHE_N_HASHES})) AS j) j
      CROSS JOIN (SELECT unnest(range(0, {D.LSHE_MAX_GAP + 1})) AS s) s),
    cap AS (
      SELECT j, h, q FROM k GROUP BY 1, 2, 3
      HAVING count(*) BETWEEN 2 AND {D.LSHE_BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a
      JOIN cap c ON c.j = a.j AND c.h = a.h AND c.q = a.q
      JOIN k b ON b.j = a.j AND b.h = a.h AND b.q = a.q
             AND a.doc_id < b.doc_id),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT cd.id_a, cd.id_b, count(*) AS i
      FROM cand cd
      JOIN sh a ON a.doc_id = cd.id_a
      JOIN sh b ON b.doc_id = cd.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i * 1.0 / least(ca.c, cb.c), 6) AS containment
    FROM inter
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
    WHERE round(i * 1.0 / least(ca.c, cb.c), 6) >= 0.9
    """,
    tags=("llm", "dedup"),
)
def dedup_containment_lsh_ensemble(spark, sf_dir):
    """Near-subset dedup at corpus scale via LSH-Ensemble
    (llm/dedup.py:lsh_ensemble_containment_pairs): docs are
    size-partitioned geometrically, each partition carries its own
    MinHash-LSH bucket space, and a doc probes its own plus the next
    max_gap partitions — so containment candidates are found without
    the posting-list cap that makes ``dedup_containment`` drop true
    subset pairs behind hot shingles. Candidates verify EXACTLY (full
    shingle intersection, keyed joins only), so output precision is 1
    and recall follows the documented S-curve envelope (≥0.84 up to a
    16× size ratio at t=0.9 with 32 hashes; every pair up to 16× is
    partition-covered)."""
    return D.lsh_ensemble_containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.9)


# ------------------------------------------------ DSIR importance weights

_DSIR_B = 256   # hashed-bigram feature buckets
_DSIR_K = 100   # selected docs


@register(
    "curation_dsir_importance",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
               FROM documents),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(ws), 1)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w),
    db AS MATERIALIZED (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(bigram), 1, 4) AS BIGINT)
               % {_DSIR_B} AS bucket,
             count(*) AS n
      FROM bg GROUP BY 1, 2, 3),
    stats AS (
      SELECT bucket, CAST(sum(n) AS BIGINT) AS c_raw,
             CAST(sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT)
               AS c_tgt
      FROM db GROUP BY 1),
    tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw,
                   CAST(sum(c_tgt) AS BIGINT) AS n_tgt FROM stats),
    llr AS (
      SELECT bucket,
             ln((c_tgt + 1.0) / (n_tgt + {_DSIR_B}))
               - ln((c_raw + 1.0) / (n_raw + {_DSIR_B})) AS llr
      FROM stats, tot),
    wts AS (
      SELECT db.doc_id, round(sum(db.n * llr.llr), 4) AS dsir_weight
      FROM db JOIN llr USING (bucket)
      GROUP BY 1)
    SELECT doc_id, dsir_weight,
           CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id)
                AS BIGINT) AS rank
    FROM wts
    QUALIFY rank <= {_DSIR_K}
    """,
    tags=("llm", "curation"),
)
def curation_dsir_importance(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, public): importance
    weight of every document under a hashed-bigram bag model —
    w(doc) = Σ_features n(doc,b)·[ln p_target(b) − ln p_raw(b)] with
    Laplace-smoothed bucket distributions (target = the English
    slice, raw = the whole corpus), top-{_DSIR_K} selected. The
    deterministic-selection variant of the paper's Gumbel resampling:
    ranking by the exact weight keeps the oracle hash-comparable.

    Scale: bigrams hash into {_DSIR_B} buckets, so the model state is
    a {_DSIR_B}-row relation (broadcast) no matter the corpus size —
    the whole point of hashed DSIR at 100 TB; per-doc weights are one
    map-side-combinable aggregate over (doc, bucket) counts; only the
    top-k window is a (tiny, aggregated) global sort."""
    db = dsir_doc_buckets(table(spark, sf_dir, "documents"))
    return dsir_weights(db, dsir_bucket_stats(db))


def dsir_doc_buckets(docs):
    """(doc_id, lang, bucket, n) hashed-bigram counts per doc — the
    shared feature extraction for the batch query AND the streaming
    stats fold (streaming/dsir_maintain.py)."""
    # guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]) — a
    # single-word doc would index element_at(ws, 2)/(ws, 0) and throw;
    # the CASE mirrors word_shingles' n >= k guard (and the oracle's
    # range(), which is empty-correct by itself)
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 1),"
        " i -> concat(element_at(split(text, ' '), i), ' ',"
        " element_at(split(text, ' '), i + 1)))"
        " ELSE CAST(array() AS ARRAY<STRING>) END")
    bg = docs.select("doc_id", "lang", F.explode(bigrams).alias("bigram"))
    return (bg.select(
        "doc_id", "lang",
        (F.conv(F.substring(F.md5("bigram"), 1, 4), 16, 10)
         .cast("long") % _DSIR_B).alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("n")))


def dsir_bucket_stats(db):
    """(bucket, c_raw, c_tgt) model state — {_DSIR_B} rows no matter
    the corpus size; ADDITIVE across any partition of the corpus, so
    the streaming fold merges it exactly."""
    return (db.groupBy("bucket")
            .agg(F.sum("n").cast("long").alias("c_raw"),
                 F.sum(F.when(F.col("lang") == "en", F.col("n"))
                       .otherwise(0)).cast("long").alias("c_tgt")))


def dsir_weights(db, stats):
    """Top-k DSIR selection from doc-bucket counts + model stats —
    identical arithmetic whether stats come from the same batch (the
    oracle-checked query) or a maintained streaming table."""
    tot = stats.agg(F.sum("c_raw").cast("long").alias("n_raw"),
                    F.sum("c_tgt").cast("long").alias("n_tgt"))
    llr = (stats.crossJoin(F.broadcast(tot))
           .select("bucket",
                   (F.log((F.col("c_tgt") + 1.0)
                          / (F.col("n_tgt") + _DSIR_B))
                    - F.log((F.col("c_raw") + 1.0)
                            / (F.col("n_raw") + _DSIR_B))).alias("llr")))
    wts = (db.join(F.broadcast(llr), "bucket")
           .groupBy("doc_id")
           .agg(F.round(F.sum(F.col("n") * F.col("llr")), 4)
                .alias("dsir_weight")))
    w = Window.orderBy(F.col("dsir_weight").desc(), F.col("doc_id"))
    return (wts.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _DSIR_K))


# ------------------------------------------ binary Hamming embedding index

_BH_POOL = 20   # approximate-pass pool per query
_BH_K = 5


def _bh_pack_sql(lo: int) -> str:
    return (f"CAST(list_sum(list_transform(range({lo}, {lo + 32}), "
            f"i -> CASE WHEN embedding[i+1] >= 0 "
            f"THEN (1::BIGINT << (i - {lo})) ELSE 0::BIGINT END)) "
            f"AS BIGINT)")


def _bh_pack_col(lo: int):
    """Sign-bit 32-dim word packer — the ONE definition both binary
    queries (index + recall sweep) and the _bh_pack_sql oracle
    fragment must stay bit-identical with."""
    return F.expr(
        f"aggregate(transform(sequence({lo}, {lo + 31}), "
        f"i -> IF(element_at(embedding, i + 1) >= CAST(0 AS FLOAT), "
        f"shiftleft(CAST(1 AS BIGINT), i - {lo}), "
        f"CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)")


@register(
    "sim_binary_hamming_index",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, embedding,
             {_bh_pack_sql(0)} AS w0,
             {_bh_pack_sql(32)} AS w1
      FROM embeddings),
    pool AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               CAST(bit_count(xor(q.w0, c.w0))
                    + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming,
               round(list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]),
                 CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(q.w0, c.w0))
                          + bit_count(xor(q.w1, c.w1)), c.vec_id)
                 AS prk
        FROM b q JOIN b c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {_BH_K})
      WHERE prk <= {_BH_POOL})
    SELECT query_id, cand_id, hamming, cosine,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, cand_id)
             AS BIGINT) AS rank
    FROM pool
    QUALIFY rank <= {_BH_K}
    """,
    tags=("llm", "similarity"),
)
def sim_binary_hamming_index(spark, sf_dir):
    """1-bit quantized retrieval + exact rerank — the binary sibling
    of ``sim_topk_int8_rerank``: every vector binarizes to its sign
    bits packed into two 32-bit words (64× less bandwidth than
    float64), the approximate pass ranks candidates by packed-word
    Hamming distance (two xor+popcount ops per comparison — no
    arithmetic), and only the top-{_BH_POOL} pool fetches full
    vectors for exact cosine rerank.

    Scale: the packed index is 16 bytes/vector — a billion vectors is
    16 GB, scannable in-memory per executor; queries broadcast; the
    rerank join touches pool·|Q| full vectors, never N·|Q|. Sign-bit
    binarization is exact in both engines (no float arithmetic before
    the compare)."""
    from ..functions.vector import cosine_similarity

    b = (table(spark, sf_dir, "embeddings")
         .select("vec_id", "embedding",
                 _bh_pack_col(0).alias("w0"),
                 _bh_pack_col(32).alias("w1")))
    q = b.filter(F.col("vec_id") < _BH_K).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("w0").alias("qw0"), F.col("w1").alias("qw1"))
    c = b.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"), "w0", "w1")
    ham = (F.expr("bit_count(qw0 ^ w0)")
           + F.expr("bit_count(qw1 ^ w1)")).cast("long")
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("cand_id") != F.col("query_id"))
              .select("query_id", "cand_id", ham.alias("hamming"),
                      F.round(cosine_similarity("q_emb", "c_emb"), 6)
                      .alias("cosine")))
    wp = Window.partitionBy("query_id").orderBy("hamming", "cand_id")
    pool = (scored.withColumn("prk", F.row_number().over(wp))
            .filter(F.col("prk") <= _BH_POOL))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id"))
    return (pool.withColumn("rank", F.row_number().over(wr).cast("long"))
            .filter(F.col("rank") <= _BH_K)
            .select("query_id", "cand_id", "hamming", "cosine", "rank"))


# ------------------------------------------------ difference hash (dHash)

_DH_GRID = 64            # 8x8 cell grid -> 8 rows x 7 gradients = 56 bits
_DH_BITS = 56
_DH_HAM = 4
# pigeonhole bands for hamming <= 4: 5 bands (12+11+11+11+11 = 56)
_DH_BANDS = [(0, 12), (12, 11), (23, 11), (34, 11), (45, 11)]


def _dhash_oracle() -> str:
    band_selects = " UNION ALL ".join(
        f"""SELECT doc_id, {bi} AS band,
                   (dhash >> {off}) & {(1 << width) - 1} AS key
            FROM dh"""
        for bi, (off, width) in enumerate(_DH_BANDS))
    return f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) >= {_DH_GRID}),
    g AS (SELECT doc_id, CAST(n // {_DH_GRID} AS BIGINT) AS cw, text
          FROM d),
    ch AS (
      SELECT doc_id, CAST((i - 1) // cw AS BIGINT) AS cell,
             ascii(substr(text, CAST(i AS INT), 1)) AS code
      FROM g, unnest(range(1, CAST({_DH_GRID} * cw + 1 AS BIGINT)))
           AS t(i)),
    cells AS MATERIALIZED (
      SELECT doc_id, cell, CAST(sum(code) AS BIGINT) AS s
      FROM ch GROUP BY 1, 2),
    dh AS MATERIALIZED (
      SELECT l.doc_id,
             CAST(sum(CASE WHEN l.s > r.s
                           THEN 1::BIGINT << CAST(
                             l.cell - (l.cell // 8) AS INT)
                           ELSE 0 END) AS BIGINT) AS dhash
      FROM cells l JOIN cells r
        ON r.doc_id = l.doc_id AND r.cell = l.cell + 1
      WHERE l.cell % 8 != 7
      GROUP BY 1),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN dh x ON x.doc_id = c.id_a
    JOIN dh y ON y.doc_id = c.id_b
    WHERE bit_count(xor(x.dhash, y.dhash)) <= {_DH_HAM}
    """


@register("multimodal_dhash_dedup", oracle=_dhash_oracle(),
          tags=("llm", "multimodal", "dedup"))
def multimodal_dhash_dedup(spark, sf_dir):
    """Difference-hash (dHash) perceptual near-dup — the gradient
    sibling completing the aHash (llm12.py) / pHash-DCT (llm13.py)
    family: over an 8×8 cell grid of the text-as-raster stand-in,
    bit (r,c) = cell(r,c) > cell(r,c+1) — HORIZONTAL GRADIENT signs,
    which survive brightness/offset shifts that flip aHash's
    global-mean bits. 56 bits (7 per row) so the hash and every
    shift stay inside a signed BIGINT in both engines; pairs within
    hamming ≤ {_DH_HAM} via the same 5-band pigeonhole + exact
    bit_count(xor) verify.

    Scale: one bounded explode + two integer aggregates per doc; the
    gradient compare is a (doc, cell)-keyed self-join of the 64-row
    per-doc cell relation (narrow — cell sums only); candidates come
    from band-key buckets, never all-pairs."""
    d = (table(spark, sf_dir, "documents")
         .filter(F.length("text") >= _DH_GRID)
         .select("doc_id", "text",
                 # integer `div` end-to-end, matching the oracle's //
                 # (ADVICE r10 item 1 — no float-floor round-trip)
                 F.expr(f"length(text) div {_DH_GRID}")
                 .cast("long").alias("cw")))
    ch = d.select(
        "doc_id", "cw",
        F.posexplode(F.expr(
            f"transform(sequence(1, {_DH_GRID} * cw), "
            "i -> ascii(substr(text, CAST(i AS INT), 1)))"
        )).alias("i0", "code")).select(
        "doc_id",
        F.expr("i0 div cw").cast("long").alias("cell"),
        "code")
    cells = (ch.groupBy("doc_id", "cell")
             .agg(F.sum("code").cast("long").alias("s")))
    left = cells.filter(F.col("cell") % 8 != 7).select(
        "doc_id", "cell", F.col("s").alias("sl"))
    right = cells.select("doc_id", (F.col("cell") - 1).alias("cell"),
                         F.col("s").alias("sr"))
    dh = (left.join(right, ["doc_id", "cell"])
          .groupBy("doc_id")
          .agg(F.sum(F.when(
              F.col("sl") > F.col("sr"),
              F.expr("shiftleft(CAST(1 AS BIGINT), "
                     "CAST(cell - (cell div 8) AS INT))"))
              .otherwise(0)).cast("long").alias("dhash"))
          .localCheckpoint())
    bands = None
    for bi, (off, width) in enumerate(_DH_BANDS):
        b = dh.select("doc_id", F.lit(bi).alias("band"),
                      (F.shiftright(F.col("dhash"), off)
                       .bitwiseAND((1 << width) - 1)).alias("key"))
        bands = b if bands is None else bands.unionByName(b)
    cand = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b")).distinct())
    ham = F.expr("bit_count(ha ^ hb)")
    return (cand
            .join(dh.select(F.col("doc_id").alias("id_a"),
                            F.col("dhash").alias("ha")), "id_a")
            .join(dh.select(F.col("doc_id").alias("id_b"),
                            F.col("dhash").alias("hb")), "id_b")
            .filter(ham <= _DH_HAM)
            .select("id_a", "id_b", ham.cast("long").alias("hamming")))


# ------------------------------------------------ vocab coverage curve

_VC_PPM = [250_000, 500_000, 750_000, 900_000, 950_000, 990_000]


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    freq AS (SELECT word, CAST(count(*) AS BIGINT) AS f
             FROM w GROUP BY 1),
    tot AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM freq),
    ranked AS MATERIALIZED (
      SELECT word, f,
             CAST(row_number() OVER (ORDER BY f DESC, word) AS BIGINT)
               AS rnk,
             CAST(sum(f) OVER (ORDER BY f DESC, word
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM freq),
    th AS (SELECT unnest(ARRAY{_VC_PPM}) AS threshold_ppm)
    SELECT CAST(th.threshold_ppm AS BIGINT) AS threshold_ppm,
           min(r.rnk) AS vocab_size,
           round(arg_min(r.cum, r.rnk) * 1.0 / any_value(tot.t), 6)
             AS coverage
    FROM th, tot, ranked r
    WHERE r.cum * 1000000 >= th.threshold_ppm * tot.t
    GROUP BY 1
    """,
    tags=("llm", "text"),
)
def vocab_coverage_curve(spark, sf_dir):
    """Tokenizer-sizing curve: the smallest vocabulary (top-N words by
    corpus frequency, ties alphabetical) whose cumulative token mass
    reaches each coverage threshold — the classic Zipf-area question
    ("how big a vocab covers 99% of tokens?") asked before training a
    tokenizer; the sibling of ``text_heaps_law`` (vocab GROWTH) and
    ``vocab_build_topk`` (the vocab itself). Threshold comparisons are
    exact integer cross-multiplications (cum·10⁶ ≥ ppm·total); the
    only float is the terminal coverage ratio.

    Scale: the corpus collapses to the (word, freq) relation first
    (map-side combinable; Heaps-bounded ≪ corpus), the running sum
    orders that aggregated relation only, and the threshold probe is a
    6-row broadcast."""
    freq = (table(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word").agg(F.count("*").cast("long").alias("f")))
    tot = freq.agg(F.sum("f").cast("long").alias("t"))
    w = Window.orderBy(F.col("f").desc(), F.col("word"))
    ranked = freq.select(
        "word", "f",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("cum"))
    th = spark.createDataFrame([(p,) for p in _VC_PPM],
                               "threshold_ppm long")
    return (ranked.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(th))
            .filter(F.col("cum") * 1_000_000
                    >= F.col("threshold_ppm") * F.col("t"))
            .groupBy("threshold_ppm")
            .agg(F.min("rnk").alias("vocab_size"),
                 F.round(F.min_by("cum", "rnk")
                         / F.first("t").cast("double"), 6)
                 .alias("coverage")))


# ----------------------------------- MinHash containment estimator

# containment from a Jaccard estimate and exact set sizes:
#   J = i/(a+b-i)  =>  i = J(a+b)/(1+J)  =>  C = i/min(a,b)
_MC_EST = "(est_j * (ca + cb) / (1 + est_j)) / least(ca, cb)"


@register(
    "dedup_minhash_containment_estimate",
    oracle=f"""
    WITH {_shingles_sql('documents', 'd').lstrip().rstrip(',')},
    {_bands_sql('d').lstrip()},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d_bands a JOIN d_bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM d_sh
            GROUP BY doc_id),
    est AS (
      SELECT c.id_a, c.id_b,
             ({_MC_AGREE}) * 1.0 / {D.N_MINHASH} AS est_j,
             ca.c AS ca, cb.c AS cb
      FROM cand c
      JOIN d_sig sa ON sa.doc_id = c.id_a
      JOIN d_sig sb ON sb.doc_id = c.id_b
      JOIN cnt ca ON ca.doc_id = c.id_a
      JOIN cnt cb ON cb.doc_id = c.id_b),
    inter AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
      FROM cand c
      JOIN d_sh sa ON sa.doc_id = c.id_a
      JOIN d_sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2)
    SELECT e.id_a, e.id_b,
           round({_MC_EST}, 6) AS est_containment,
           round(i.i * 1.0 / least(e.ca, e.cb), 6) AS containment,
           round(abs({_MC_EST} - i.i * 1.0 / least(e.ca, e.cb)), 6)
             AS abs_err
    FROM est e JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    """,
    tags=("llm", "dedup", "sketch"),
)
def dedup_minhash_containment_estimate(spark, sf_dir):
    """Containment estimated from the MinHash sketch alone — the
    LSH-Ensemble paper's conversion C = J(|A|+|B|)/((1+J)·min(|A|,|B|))
    applied to the signature-agreement Jaccard estimate, audited
    against the exact containment per candidate pair (the sibling of
    the driver-green ``dedup_minhash_estimate`` Jaccard audit). This
    is the query that sizes the sketch before trusting
    ``dedup_containment_lsh_ensemble``'s candidate recall at corpus
    scale: set sizes are exact (stored per doc), so ALL estimator
    error comes from J̃ — visible in abs_err.

    Scale: one signature pass feeds bands and the estimate; exact
    verification joins candidate docs' shingles only."""
    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs)
    cand = D.lsh_candidate_pairs(docs)
    sh = D.word_shingles(docs, distinct=True)
    cnt = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("c"))
    agree = sum(
        F.when(F.col(f"a.h{j}") == F.col(f"b.h{j}"), 1).otherwise(0)
        for j in range(D.N_MINHASH))
    est_j = agree / F.lit(D.N_MINHASH)
    est_c = (est_j * (F.col("ca") + F.col("cb")) / (1 + est_j)) \
        / F.least("ca", "cb")
    est = (cand
           .join(sig.alias("a"), F.col("id_a") == F.col("a.doc_id"))
           .join(sig.alias("b"), F.col("id_b") == F.col("b.doc_id"))
           # cnt is per-document — no broadcast hint (AQE converts
           # when small; unconditional hint would OOM at corpus scale)
           .join(cnt.select(F.col("doc_id").alias("id_a"),
                            F.col("c").alias("ca")), "id_a")
           .join(cnt.select(F.col("doc_id").alias("id_b"),
                            F.col("c").alias("cb")), "id_b")
           .select("id_a", "id_b", est_c.alias("est_c"),
                   "ca", "cb"))
    inter = (cand
             .join(sh.select(F.col("doc_id").alias("id_a"), "shingle"),
                   "id_a")
             .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"),
                   ["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").cast("long").alias("i")))
    exact_c = F.col("i") / F.least("ca", "cb").cast("double")
    return (est.join(inter, ["id_a", "id_b"])
            .select("id_a", "id_b",
                    F.round("est_c", 6).alias("est_containment"),
                    F.round(exact_c, 6).alias("containment"),
                    F.round(F.abs(F.col("est_c") - exact_c), 6)
                    .alias("abs_err")))


# ------------------------------------ intrinsic dimension (MLE)

_ID_K = 6        # use ratios T_k/T_j, j = 1..k-1
_ID_MOD = 10     # anchors: vec_id % 10 == 0 (deterministic 10%)


@register(
    "embedding_intrinsic_dim_mle",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    anchors AS (SELECT vec_id AS aid, v AS av FROM e
                WHERE vec_id % {_ID_MOD} = 0),
    d2 AS (
      SELECT a.aid, e.vec_id AS cid,
             list_sum(list_transform(list_zip(a.av, e.v),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM anchors a JOIN e ON e.vec_id != a.aid),
    rnk AS (
      SELECT aid, cid, d2,
             row_number() OVER (PARTITION BY aid ORDER BY d2, cid)
               AS rk
      FROM d2 WHERE d2 > 0),
    kth AS (SELECT aid, d2 AS dk FROM rnk WHERE rk = {_ID_K}),
    logs AS (
      SELECT sum(0.5 * ln(k.dk / r.d2)) AS logsum,
             CAST(count(DISTINCT r.aid) AS BIGINT) AS n_anchors
      FROM rnk r JOIN kth k ON k.aid = r.aid
      WHERE r.rk < {_ID_K})
    SELECT n_anchors, CAST({_ID_K} AS BIGINT) AS k,
           round(n_anchors * ({_ID_K} - 1) / logsum, 4) AS m_hat
    FROM logs
    """,
    tags=("llm", "similarity", "stats"),
)
def embedding_intrinsic_dim_mle(spark, sf_dir):
    """Levina-Bickel MLE of the embedding cloud's intrinsic dimension
    (MacKay-Ghahramani averaged-inverse form): m̂ = n(k−1) /
    ΣΣ ln(T_k/T_j) over each anchor's k nearest neighbors — the
    diagnostic that says whether 64-dim embeddings actually live on a
    ~10-dim manifold (and hence how hard ANN indexing/quantization can
    compress). Anchors are a deterministic 10% (vec_id mod), distances
    are squared euclidean (the log halves — no sqrt), zero-distance
    duplicates are excluded, ranking ties break by cand_id.

    Scale: |anchors|·N distance pairs with the anchor side broadcast —
    the brute-force-topk shape; per-anchor top-k is a window heap. At
    corpus scale the anchor fraction is the cost dial (the estimator
    converges with hundreds of anchors regardless of N)."""
    e = (table(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v")))
    anchors = (e.filter(F.col("vec_id") % _ID_MOD == 0)
               .select(F.col("vec_id").alias("aid"),
                       F.col("v").alias("av")))
    d2 = (e.crossJoin(F.broadcast(anchors))
          .filter(F.col("vec_id") != F.col("aid"))
          .select(F.col("aid"), F.col("vec_id").alias("cid"),
                  F.aggregate(
                      F.zip_with("av", "v",
                                 lambda x, y: (x - y) * (x - y)),
                      F.lit(0.0), lambda acc, z: acc + z).alias("d2"))
          .filter(F.col("d2") > 0))
    w = Window.partitionBy("aid").orderBy("d2", "cid")
    rnk = d2.withColumn("rk", F.row_number().over(w)) \
        .filter(F.col("rk") <= _ID_K)
    kth = rnk.filter(F.col("rk") == _ID_K).select(
        "aid", F.col("d2").alias("dk"))
    logs = (rnk.filter(F.col("rk") < _ID_K)
            .join(kth, "aid")
            .agg(F.sum(0.5 * F.log(F.col("dk") / F.col("d2")))
                 .alias("logsum"),
                 F.countDistinct("aid").cast("long").alias("n_anchors")))
    return logs.select(
        "n_anchors", F.lit(_ID_K).cast("long").alias("k"),
        F.round(F.col("n_anchors") * (_ID_K - 1) / F.col("logsum"), 4)
        .alias("m_hat"))


# ------------------------------------------------ nDCG search eval

_NDCG_K = 10
# literal log2 discounts — generated constants, no runtime log2()
_NDCG_W = {i: round(1.0 / math.log2(i + 1), 12)
           for i in range(1, _NDCG_K + 1)}


def _ndcg_w_sql(rank_col: str) -> str:
    return ("CASE " + " ".join(
        f"WHEN {rank_col} = {i} THEN {w!r}"
        for i, w in _NDCG_W.items()) + " ELSE 0.0 END")


@register(
    "text_ndcg_search_eval",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    q AS (SELECT unnest(ARRAY{T_BM25_TERMS!r}) AS word),
    grades AS MATERIALIZED (
      SELECT w.doc_id,
             CAST(count(DISTINCT w.word) AS BIGINT) AS grade
      FROM w JOIN q USING (word) GROUP BY 1),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT count(*) AS n_docs, (SELECT avg(dl) FROM dl) AS avgdl
      FROM documents),
    tf AS (
      SELECT doc_id, word, count(*) AS tf FROM w
      WHERE word IN ({", ".join(f"'{t}'" for t in T_BM25_TERMS)})
      GROUP BY 1, 2),
    dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf
              GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * (1.2 + 1))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               AS term_score
      FROM tf
      JOIN dfreq USING (word)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats),
    bm AS (
      SELECT doc_id, round(sum(term_score), 4) AS bm25
      FROM scored GROUP BY doc_id),
    ranked AS (
      SELECT bm.doc_id,
             coalesce(g.grade, 0) AS grade,
             row_number() OVER (ORDER BY bm.bm25 DESC, bm.doc_id)
               AS rnk
      FROM bm LEFT JOIN grades g ON g.doc_id = bm.doc_id),
    dcg AS (
      SELECT sum(((1 << grade) - 1) * ({_ndcg_w_sql('rnk')})) AS dcg
      FROM ranked WHERE rnk <= {_NDCG_K}),
    ideal AS (
      SELECT sum(((1 << grade) - 1) * ({_ndcg_w_sql('irk')})) AS idcg
      FROM (SELECT grade,
                   row_number() OVER (ORDER BY grade DESC) AS irk
            FROM grades)
      WHERE irk <= {_NDCG_K})
    SELECT round(dcg.dcg, 4) AS dcg_at_k,
           round(ideal.idcg, 4) AS idcg_at_k,
           round(dcg.dcg / ideal.idcg, 4) AS ndcg_at_k
    FROM dcg, ideal
    """,
    tags=("llm", "text", "search"),
)
def text_ndcg_search_eval(spark, sf_dir):
    """nDCG@{_NDCG_K} of the BM25 ranking against a deterministic
    graded-relevance label (grade = distinct query terms present,
    0-4) — the ranking-quality eval every search stack runs
    next to its scorer (``sim_recall_at_k_eval`` is the vector-side
    sibling). Gains are exact integers (2^grade − 1); the rank
    discounts 1/log2(i+1) are LITERAL constants generated in Python
    (no runtime log2 — the ts_ewma weight discipline), so the only
    floats are ten fixed products; ranking ties break on the already
    4dp-rounded BM25 score then doc_id, which both engines order
    identically.

    Scale: BM25's inverted-index shape + one {_NDCG_K}-row window
    head; the ideal ranking needs only the top-{_NDCG_K} grades (a
    heap, not a sort, under TakeOrdered)."""
    from ..llm import textstats as T2
    bm = T2.bm25_scores(table(spark, sf_dir, "documents"), T_BM25_TERMS)
    wq = (table(spark, sf_dir, "documents")
          .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word").isin(*T_BM25_TERMS))
          .groupBy("doc_id")
          .agg(F.countDistinct("word").cast("long").alias("grade")))
    ranked = (bm.join(wq, "doc_id", "left")
              .select("doc_id", F.coalesce("grade", F.lit(0)).alias("grade"),
                      F.row_number().over(
                          Window.orderBy(F.col("bm25").desc(), "doc_id"))
                      .alias("rnk")))
    wlit = F.when(F.lit(False), 0.0)
    for i, wv in _NDCG_W.items():
        wlit = wlit.when(F.col("rnk") == i, wv)
    gain = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(grade AS INT)) - 1")
    dcg = (ranked.filter(F.col("rnk") <= _NDCG_K)
           .agg(F.sum(gain * wlit.otherwise(0.0)).alias("dcg")))
    ideal_ranked = wq.select(
        "grade", F.row_number().over(Window.orderBy(F.col("grade").desc()))
        .alias("rnk"))
    idcg = (ideal_ranked.filter(F.col("rnk") <= _NDCG_K)
            .agg(F.sum(gain * wlit.otherwise(0.0)).alias("idcg")))
    return (dcg.crossJoin(F.broadcast(idcg))
            .select(F.round("dcg", 4).alias("dcg_at_k"),
                    F.round("idcg", 4).alias("idcg_at_k"),
                    F.round(F.col("dcg") / F.col("idcg"), 4)
                    .alias("ndcg_at_k")))


# --------------------------- binary-index pool-size recall sweep

_BP_POOLS = [10, 20, 40]


@register(
    "sim_binary_pool_recall_sweep",
    oracle=f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, embedding,
             {_bh_pack_sql(0)} AS w0,
             {_bh_pack_sql(32)} AS w1
      FROM embeddings),
    scored AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
               AS hamming,
             round(list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]),
               CAST(c.embedding AS DOUBLE[])), 6) AS cosine
      FROM b q JOIN b c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {_BH_K}),
    exact AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rk
        FROM scored) WHERE rk <= {_BH_K}),
    hrank AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, cand_id) AS hrk
      FROM scored),
    pools AS (SELECT unnest(ARRAY{_BP_POOLS}) AS pool),
    hits AS (
      SELECT p.pool, CAST(count(*) AS BIGINT) AS n_hit
      FROM pools p
      JOIN hrank h ON h.hrk <= p.pool
      JOIN exact e ON e.query_id = h.query_id
                  AND e.cand_id = h.cand_id
      GROUP BY 1)
    SELECT CAST(p.pool AS BIGINT) AS pool,
           round(coalesce(h.n_hit, 0) * 1.0
                 / ({_BH_K} * {_BH_K}), 4) AS recall_at_{_BH_K}
    FROM pools p LEFT JOIN hits h ON h.pool = p.pool
    """,
    tags=("llm", "similarity"),
)
def sim_binary_pool_recall_sweep(spark, sf_dir):
    """Recall-vs-pool-size curve for the 1-bit Hamming index: how many
    of the exact cosine top-{_BH_K} survive a Hamming pre-filter of
    pool 10/20/40 — the tuning sweep run before trusting
    ``sim_binary_hamming_index`` in production (the binary sibling of
    the driver-green ``sim_ann_nprobe_recall_sweep``). Both rankings
    come from ONE scored relation (ranked twice, by cosine and by
    Hamming), the pool thresholds are a 3-row broadcast, recall
    denominators are exact integers.

    Scale: the scored relation is |Q|·N with |Q| broadcast; at corpus
    scale the exact arm comes from an offline golden set and the sweep
    touches only the index."""
    from ..functions.vector import cosine_similarity

    b = (table(spark, sf_dir, "embeddings")
         .select("vec_id", "embedding",
                 _bh_pack_col(0).alias("w0"),
                 _bh_pack_col(32).alias("w1")))
    q = b.filter(F.col("vec_id") < _BH_K).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("w0").alias("qw0"), F.col("w1").alias("qw1"))
    c = b.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"), "w0", "w1")
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("cand_id") != F.col("query_id"))
              .select("query_id", "cand_id",
                      (F.expr("bit_count(qw0 ^ w0)")
                       + F.expr("bit_count(qw1 ^ w1)")).alias("hamming"),
                      F.round(cosine_similarity("q_emb", "c_emb"), 6)
                      .alias("cosine"))
              .localCheckpoint())
    we = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "cand_id")
    exact = (scored.withColumn("rk", F.row_number().over(we))
             .filter(F.col("rk") <= _BH_K).select("query_id", "cand_id"))
    wh = Window.partitionBy("query_id").orderBy("hamming", "cand_id")
    hrank = scored.withColumn("hrk", F.row_number().over(wh)) \
        .select("query_id", "cand_id", "hrk")
    pools = spark.createDataFrame([(p,) for p in _BP_POOLS], "pool long")
    hits = (hrank.crossJoin(F.broadcast(pools))
            .filter(F.col("hrk") <= F.col("pool"))
            .join(exact, ["query_id", "cand_id"])
            .groupBy("pool").agg(F.count("*").cast("long").alias("n_hit")))
    return (pools.join(hits, "pool", "left")
            .select("pool",
                    F.round(F.coalesce("n_hit", F.lit(0))
                            / float(_BH_K * _BH_K), 4)
                    .alias(f"recall_at_{_BH_K}")))
