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
