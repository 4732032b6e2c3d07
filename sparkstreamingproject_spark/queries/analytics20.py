"""Round-5 wave 3: set-similarity self-join with prefix filtering
(AllPairs/PPJoin), linear multi-touch attribution, and multi-probe
LSH candidate generation — three operator families the registry
lacked (the first and third are canonical scale techniques: prefix
filtering bounds candidate volume without all-pairs; multi-probe
trades extra bucket probes for fewer LSH tables).

Float discipline: set similarity and attribution are pure integer
(truncating basis-point division, identical in both engines); the
multi-probe cosine reuses the 6dp-rounded ranking expression of the
driver-green ``sim_topk_bruteforce``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import similarity as S
from .base import register, table

_US_7D = 7 * 24 * 3600 * 1_000_000


@register(
    "dedup_basket_setsim",
    oracle="""
    WITH s AS (SELECT l_orderkey AS k,
                      CAST(count(DISTINCT l_partkey) AS BIGINT) AS sz
               FROM lineitem GROUP BY 1),
    tok AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS item
            FROM lineitem),
    cand AS (SELECT a.k AS ka, b.k AS kb, CAST(count(*) AS BIGINT)
                      AS inter
             FROM tok a JOIN tok b ON a.item = b.item AND a.k < b.k
             GROUP BY 1, 2)
    SELECT ka, kb, inter, sa.sz AS sa, sb.sz AS sb,
           CAST((inter * 10000) // (sa.sz + sb.sz - inter) AS BIGINT)
             AS jac_bp
    FROM cand JOIN s sa ON sa.k = ka JOIN s sb ON sb.k = kb
    WHERE inter * 100 >= (sa.sz + sb.sz - inter) * 50
    """,
    tags=("dedup", "join"),
)
def dedup_basket_setsim(spark, sf_dir):
    """Near-duplicate order baskets: all order pairs whose part sets
    have Jaccard >= 0.5, via the prefix-filtered set-similarity join
    (operators/setsim.py) — items sorted rarest-first, only the
    |s|-ceil(t|s|)+1 prefix generates candidates, exact verify on the
    candidate pairs. The oracle states the same result through the
    shared-item join (bounded by item co-occurrence); the Spark plan
    is the PPJoin shape whose candidate volume stays sub-quadratic at
    any corpus size. Output is integer basis points."""
    from ..operators.setsim import setsim_self_join
    li = (table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("item")))
    return setsim_self_join(li, "k", "item", threshold_pct=50)


@register(
    "events_attribution_linear",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
               FROM events),
    p AS (SELECT user_id, us, event_id FROM e
          WHERE event_type = 'purchase'),
    t AS (SELECT p.event_id AS pid, e2.event_type AS touch
          FROM p JOIN e e2 ON e2.user_id = p.user_id
                          AND e2.us < p.us
                          AND p.us - e2.us <= {_US_7D}
                          AND e2.event_type <> 'purchase'),
    k AS (SELECT pid, CAST(count(*) AS BIGINT) AS nt FROM t
          GROUP BY pid),
    credit AS (SELECT t.touch AS attributed_to,
                      CAST(10000 // k.nt AS BIGINT) AS bp
               FROM t JOIN k USING (pid)
               UNION ALL
               SELECT 'organic', CAST(10000 AS BIGINT)
               FROM p LEFT JOIN k ON k.pid = p.event_id
               WHERE k.pid IS NULL)
    SELECT attributed_to, CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(bp) AS BIGINT) AS credit_bp
    FROM credit GROUP BY 1
    """,
    tags=("events", "analytics", "join"),
)
def events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: every purchase splits 10000
    credit basis points equally (truncating division — deterministic
    in both engines) across ALL non-purchase touches by the same user
    in the prior 7 days; touchless purchases credit 'organic'.
    Companion to the driver-green last-touch model — needs the actual
    touch SET, so it is a user-keyed interval join (the
    range_join_event_pairs shape: bounded by per-user activity, never
    a cross join) instead of a running-window carry."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id",
        "event_type")
    p = (e.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("us").alias("pus"),
                 F.col("event_id").alias("pid")))
    t = (p.join(e, "user_id")
         .filter((F.col("us") < F.col("pus"))
                 & (F.col("pus") - F.col("us") <= _US_7D)
                 & (F.col("event_type") != "purchase"))
         .select("pid", F.col("event_type").alias("touch")))
    k = t.groupBy("pid").agg(F.count("*").alias("nt"))
    credit = (t.join(k, "pid")
              .select(F.col("touch").alias("attributed_to"),
                      F.expr("10000 div nt").cast("bigint").alias("bp"))
              .unionAll(
                  p.join(k, "pid", "left_anti")
                  .select(F.lit("organic").alias("attributed_to"),
                          F.lit(10000).cast("bigint").alias("bp"))))
    return (credit.groupBy("attributed_to")
            .agg(F.count("*").alias("n_touches"),
                 F.sum("bp").alias("credit_bp")))


def _multiprobe_oracle() -> str:
    planes = S.hyperplanes()
    bits = " || ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"{plane!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes)
    return f"""
    WITH b AS (SELECT vec_id, {bits} AS bucket FROM embeddings),
    q AS (SELECT * FROM b WHERE vec_id < 5),
    probes AS (
      SELECT q.vec_id AS query_id,
             CASE WHEN i = 0 THEN q.bucket
                  ELSE substr(q.bucket, 1, CAST(i - 1 AS INT))
                       || (CASE WHEN substr(q.bucket, CAST(i AS INT), 1)
                                     = '1' THEN '0' ELSE '1' END)
                       || substr(q.bucket, CAST(i + 1 AS INT))
             END AS probe
      FROM q, unnest(range(0, 9)) AS g(i)),
    cand AS (SELECT DISTINCT p.query_id, c.vec_id AS cand_id
             FROM probes p JOIN b c ON c.bucket = p.probe
             WHERE c.vec_id <> p.query_id),
    scored AS (SELECT cand.query_id, cand.cand_id,
                      round(list_cosine_similarity(
                        CAST(qe.embedding AS DOUBLE[]),
                        CAST(ce.embedding AS DOUBLE[])), 6) AS cosine
               FROM cand
               JOIN embeddings qe ON qe.vec_id = cand.query_id
               JOIN embeddings ce ON ce.vec_id = cand.cand_id)
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """


@register("sim_ann_multiprobe", oracle=_multiprobe_oracle(),
          tags=("llm", "similarity"))
def sim_ann_multiprobe(spark, sf_dir):
    """Multi-probe LSH: each query probes its own hyperplane bucket
    PLUS the 8 Hamming-distance-1 buckets (one flipped sign bit), then
    exact-cosine top-5 over the pooled candidates. The published
    recall lever that replaces extra LSH tables with extra probes —
    at scale the probe list is a 9-row explode per query joined
    against the bucketed (pre-partitioned) index, so recall rises with
    ZERO extra index storage. Ranking reuses the 6dp-rounded cosine of
    sim_topk_bruteforce."""
    emb = table(spark, sf_dir, "embeddings")
    b = S.lsh_bucket(emb).select("vec_id", "bucket")
    q = b.filter(F.col("vec_id") < 5)
    i = F.col("i").cast("int")
    probe = (F.when(F.col("i") == 0, F.col("bucket"))
             .otherwise(F.concat(
                 F.expr("substring(bucket, 1, i - 1)"),
                 F.when(F.expr("substring(bucket, i, 1)") == "1",
                        "0").otherwise("1"),
                 F.expr("substring(bucket, i + 1)"))))
    probes = (q.select(F.col("vec_id").alias("query_id"), "bucket",
                       F.explode(F.sequence(F.lit(0), F.lit(8)))
                       .alias("i"))
              .withColumn("i", i)
              .select("query_id", probe.alias("probe")))
    cand = (probes.join(b.select(F.col("vec_id").alias("cand_id"),
                                 F.col("bucket").alias("probe")),
                        "probe")
            .filter(F.col("cand_id") != F.col("query_id"))
            .select("query_id", "cand_id").distinct())
    qe = emb.select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("c_emb"))
    from ..functions.vector import cosine_similarity
    scored = (cand.join(F.broadcast(qe), "query_id").join(ce, "cand_id")
              .select("query_id", "cand_id",
                      F.round(cosine_similarity("q_emb", "c_emb"), 6)
                      .alias("cosine")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cosine").desc(), F.col("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "cand_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))
