"""Round-3 LLM-pipeline wave: domain-mix rebalancing, contrastive
hard-negative mining, and n-gram containment dedup.

Oracle discipline matches queries/llm.py: shared constants (shingle K,
md5 bucket hashing) generate both sides, derived floats rounded
identically before any threshold or comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from ..llm import dedup as D
from .base import register, table
from .llm import SHINGLES_CTE
from .llm2 import _bands_sql, _shingles_sql


@register(
    "domain_mix_rebalance",
    oracle="""
    WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
    r AS (
      SELECT source, cnt,
             round(least(1.0,
               (SELECT count(*) FROM documents) * 1.0 /
               (SELECT count(*) FROM c) / cnt), 6) AS rate
      FROM c)
    SELECT d.doc_id, d.source, r.rate
    FROM documents d JOIN r USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < r.rate
    """,
    tags=("llm", "sampling"),
)
def domain_mix_rebalance(spark, sf_dir):
    """Domain-mix rebalancing: downsample over-represented sources so
    every source contributes (at most) an equal share — the 'data
    mixture' step of corpus assembly. Per-source keep-rates come from
    one tiny aggregate (|sources| rows, broadcast back); the keep
    decision is a deterministic md5-bucket test fused into the corpus
    scan, so re-runs and both engines select the identical document
    set. One scan, one broadcast join — no shuffle of the corpus."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy()
    rates = counts.select(
        "source",
        F.round(F.least(F.lit(1.0),
                        F.sum("cnt").over(w) / F.count("*").over(w)
                        / F.col("cnt")), 6).alias("rate"))
    frac = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("long") / F.lit(4294967296.0))
    return (docs.join(F.broadcast(rates), "source")
            .filter(frac < F.col("rate"))
            .select("doc_id", "source", "rate"))


@register(
    "sim_hard_negatives",
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
      FROM embeddings q JOIN embeddings c
        ON c.label != q.label
      WHERE q.vec_id < 5)
    WHERE rank <= 5
    """,
    tags=("llm", "similarity"),
)
def sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar vectors with a DIFFERENT label —
    the examples a bi-encoder most needs to push apart. Same plan
    shape as sim_topk_bruteforce (broadcast query side, score in
    codegen, per-query window top-k — partial sort per query, never
    global), with the label-mismatch predicate fused before scoring so
    same-label pairs never reach the ranker."""
    emb = table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("label").alias("q_label")))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"),
                   F.col("label").alias("c_label"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("c_label") != F.col("q_label"))
              .select("query_id", "cand_id",
                      F.round(cosine_similarity("q_emb", "c_emb"), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "cand_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "multimodal_image_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents),
    d AS (
      SELECT doc_id, byte_len,
             CAST(ceil(byte_len / 16.0) AS BIGINT) AS src_h
      FROM m),
    o AS (
      SELECT doc_id, byte_len, src_h,
             greatest(1, (src_h * 8) // greatest(src_h, 16)) AS out_h,
             greatest(1, 128 // greatest(src_h, 16)) AS out_w
      FROM d WHERE src_h > 0)
    SELECT doc_id, out_w, out_h, u AS out_row,
           (u * src_h) // out_h AS src_row,
           ((u * src_h) // out_h) * 16 AS byte_start,
           least(((u * src_h) // out_h) * 16 + 16, byte_len) AS byte_end
    FROM (SELECT doc_id, byte_len, src_h, out_h, out_w,
                 unnest(range(0, out_h)) AS u
          FROM o)
    """,
    tags=("llm", "multimodal"),
)
def multimodal_image_resize(spark, sf_dir):
    """Nearest-neighbor resize plan (llm/multimodal.py:
    image_resize_plan): aspect-preserving output dims for a target max
    dimension of 8, one row per output row with the source-row byte
    extent to fetch. Metadata-only — the payload column is pruned; the
    pixel work runs downstream in mapInPandas (resize_stub) against
    exactly these extents."""
    from ..llm.multimodal import attach_payload, image_resize_plan
    d = attach_payload(table(spark, sf_dir, "documents"))
    return image_resize_plan(d).select(
        "doc_id", "out_w", "out_h",
        F.col("out_row").cast("long").alias("out_row"),
        "src_row", "byte_start", "byte_end")


@register(
    "dedup_containment",
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
           round(i * 1.0 / least(ca.c, cb.c), 6) AS containment
    FROM inter
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE round(i * 1.0 / least(ca.c, cb.c), 6) >= 0.9
    """,
    tags=("llm", "dedup"),
)
def dedup_containment(spark, sf_dir):
    """N-gram containment dedup (llm/dedup.py:containment_pairs):
    C = |A∩B| / min(|A|,|B|) flags near-subset duplication — a short
    doc quoted inside a long one scores C≈1 where Jaccard is
    arbitrarily low. Runs capped (max_postings=50) like the headline
    Jaccard: stop-shingles are dropped before pair generation on both
    engines."""
    return D.containment_pairs(table(spark, sf_dir, "documents"),
                               threshold=0.9, max_postings=50)


_AGREE = " + ".join(
    f"(CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END)"
    for j in range(D.N_MINHASH))


@register(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH {_shingles_sql('documents', 'd').lstrip().rstrip(',')},
    {_bands_sql('d').lstrip()},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d_bands a JOIN d_bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    est AS (
      SELECT c.id_a, c.id_b,
             round(({_AGREE}) * 1.0 / {D.N_MINHASH}, 4) AS est_jaccard
      FROM cand c JOIN d_sig sa ON sa.doc_id = c.id_a
                  JOIN d_sig sb ON sb.doc_id = c.id_b),
    cnt AS (SELECT doc_id, count(*) AS c FROM d_sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN d_sh sa ON sa.doc_id = c.id_a
      JOIN d_sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b),
    exact AS (
      SELECT i.id_a, i.id_b,
             round(i.i * 1.0 / (ca.c + cb.c - i.i), 6) AS jaccard
      FROM inter i JOIN cnt ca ON ca.doc_id = i.id_a
                   JOIN cnt cb ON cb.doc_id = i.id_b)
    SELECT e.id_a, e.id_b, e.est_jaccard, x.jaccard,
           round(abs(e.est_jaccard - x.jaccard), 6) AS abs_err
    FROM est e JOIN exact x ON x.id_a = e.id_a AND x.id_b = e.id_b
    """,
    tags=("llm", "dedup", "sketch"),
)
def dedup_minhash_estimate(spark, sf_dir):
    """Sketch-accuracy audit: for every LSH candidate pair, the
    MinHash-estimated Jaccard (signature agreement fraction) next to
    the exact Jaccard and the absolute error — the query an engineer
    runs to size N_MINHASH/bands before trusting estimates at corpus
    scale. Candidates and signatures come from the shared MinHash
    pipeline (one signature pass feeds bands AND the estimate); the
    exact check joins only candidate docs' shingles, the
    lsh_verified_pairs cost shape — never all-pairs."""
    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs)
    cand = D.lsh_candidate_pairs(docs)
    agree = sum(
        F.when(F.col(f"a.h{j}") == F.col(f"b.h{j}"), 1).otherwise(0)
        for j in range(D.N_MINHASH))
    est = (cand
           .join(sig.alias("a"),
                 F.col("id_a") == F.col("a.doc_id"))
           .join(sig.alias("b"),
                 F.col("id_b") == F.col("b.doc_id"))
           .select("id_a", "id_b",
                   F.round(agree / F.lit(D.N_MINHASH), 4)
                   .alias("est_jaccard")))
    exact = D.lsh_verified_pairs(docs, threshold=0.0)
    return (est.join(exact, ["id_a", "id_b"])
            .select("id_a", "id_b", "est_jaccard", "jaccard",
                    F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6)
                    .alias("abs_err")))


@register(
    "dedup_cluster_keep_best",
    oracle=None,  # set below (needs MINHASH_CTE from .llm at import time)
    tags=("llm", "dedup", "graph"),
)
def dedup_cluster_keep_best(spark, sf_dir):
    """The production dedup DECISION: per near-dup cluster (connected
    components over LSH candidate pairs), keep the highest-quality
    member — quality here is the unique-token ratio, ties to the
    smallest doc_id — instead of the arbitrary min-id. Components via
    iterative min-label propagation (llm/dedup.py); the quality argmax
    is one window over the (tiny) clustered-docs relation. The oracle
    replays the same fixpoint with a recursive CTE, so the full
    cluster→score→keep pipeline is hash-verified."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.lsh_candidate_pairs(docs)
    cc = D.connected_components(pairs)
    toks = F.split(F.col("text"), " ")
    q = docs.select(
        "doc_id",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6)
        .alias("uq"))
    labeled = (cc.select(F.col("u").alias("doc_id"),
                         F.col("label").alias("component"))
               .join(q, "doc_id"))
    w = Window.partitionBy("component")
    rn = F.row_number().over(
        Window.partitionBy("component").orderBy(F.desc("uq"), "doc_id"))
    return (labeled
            .withColumn("n_members", F.count("*").over(w))
            .withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("component", F.col("doc_id").alias("keep_id"),
                    F.col("uq").alias("keep_quality"), "n_members"))


def _cluster_keep_best_oracle() -> str:
    from .llm import MINHASH_CTE, _BAND_SELECTS
    return f"""
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
    comp AS (SELECT u AS doc_id, min(label) AS component FROM walk GROUP BY u),
    q AS (
      SELECT doc_id,
             round(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS uq
      FROM documents)
    SELECT component, keep_id, keep_quality, n_members FROM (
      SELECT c.component, q.doc_id AS keep_id, q.uq AS keep_quality,
             count(*) OVER (PARTITION BY c.component) AS n_members,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.uq DESC, q.doc_id) AS rn
      FROM comp c JOIN q USING (doc_id))
    WHERE rn = 1
    """


from .base import REGISTRY as _REG  # noqa: E402

_REG["dedup_cluster_keep_best"].oracle = _cluster_keep_best_oracle()


@register(
    "embedding_label_centroids",
    oracle="""
    WITH x AS (
      SELECT label, unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings),
    m AS (SELECT label, pos, round(avg(v), 6) AS m FROM x GROUP BY 1, 2),
    c AS (SELECT label, list(m ORDER BY pos) AS cv FROM m GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           round(list_cosine_similarity(a.cv, b.cv), 4) AS cosine
    FROM c a JOIN c b ON a.label < b.label
    """,
    tags=("llm", "embedding"),
)
def embedding_label_centroids(spark, sf_dir):
    """Inter-class geometry audit: per-label centroid (mean per
    dimension over the label's vectors) and the pairwise cosine between
    centroids — collapsed classes (cosine → 1) predict hard-negative
    confusion before training does. The corpus scan collapses to
    |labels|×d partial aggregates map-side (posexplode + avg — same
    keyed-aggregation shape as the k-means step); the pairwise matrix
    is |labels|² rows of driver-free join. Centroid components rounded
    to 6dp before the cosine (summation-order discipline), cosine to
    4dp."""
    emb = table(spark, sf_dir, "embeddings")
    cent = (emb.select("label",
                       F.posexplode(F.col("embedding").cast("array<double>"))
                       .alias("pos", "v"))
            .groupBy("label", "pos").agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                 .alias("pm"))
            .select("label",
                    F.transform("pm", lambda s: s["m"]).alias("cv")))
    a = cent.select(F.col("label").alias("label_a"), F.col("cv").alias("cv_a"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cv").alias("cv_b"))
    return (a.join(b, F.col("label_a") < F.col("label_b"))
            .select("label_a", "label_b",
                    F.round(cosine_similarity("cv_a", "cv_b"), 4)
                    .alias("cosine")))


@register(
    "embedding_quantile_bins",
    oracle="""
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings),
    b AS (
      SELECT pos, v,
             ntile(4) OVER (PARTITION BY pos ORDER BY v, vec_id) AS bin
      FROM x)
    SELECT pos, bin, CAST(count(*) AS BIGINT) AS n,
           -- + 0.0 canonicalizes IEEE -0.0 (DuckDB's native double
           -- round keeps the sign; Spark's BigDecimal round cannot)
           round(min(v), 4) + 0.0 AS min_v,
           round(max(v), 4) + 0.0 AS max_v
    FROM b GROUP BY pos, bin
    """,
    tags=("llm", "embedding", "feature"),
)
def embedding_quantile_bins(spark, sf_dir):
    """Equal-frequency binning per embedding dimension (4 quartile
    bins via ntile, ties broken by vec_id so both engines cut
    identically) — the feature-discretization step for tree models and
    per-dimension drift monitors. posexplode fans the corpus to
    (pos, v) rows; the window keys on pos (d partitions of N rows —
    keyed sort, no global order), and the bin summary collapses to
    d×4 rows map-side."""
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select("vec_id",
                   F.posexplode(F.col("embedding").cast("array<double>"))
                   .alias("pos", "v"))
    w = Window.partitionBy("pos").orderBy("v", "vec_id")
    return (x.withColumn("bin", F.ntile(4).over(w))
            .groupBy("pos", "bin")
            .agg(F.count("*").alias("n"),
                 # + 0.0 mirrors the oracle's signed-zero
                 # canonicalization (no-op here; VERDICT r04)
                 (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
                 (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v")))
