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


# ------------------------------------------------ Shapley attribution

#: channel -> coalition bit (the 4 non-purchase event types)
_SH_BITS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))
#: |S|!(n-|S|-1)! for n=4 by |S| — Shapley weights x 4! = 24
_SH_COEF = {0: 6, 1: 2, 2: 2, 3: 6}


@register(
    "events_attribution_shapley",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                      event_type FROM events),
    p AS (SELECT user_id, us AS pus, event_id AS pid FROM e
          WHERE event_type = 'purchase'),
    t AS (SELECT DISTINCT p.pid, e.event_type AS touch
          FROM p JOIN e USING (user_id)
          WHERE e.us < p.pus AND p.pus - e.us <= {7 * 86400 * 1_000_000}
            AND e.event_type <> 'purchase'),
    m AS (SELECT pid,
                 CAST(sum(CASE touch {" ".join(
                     f"WHEN '{c}' THEN {b}" for c, b in _SH_BITS)}
                          END) AS INT) AS mask
          FROM t GROUP BY 1),
    allp AS (SELECT p.pid, coalesce(m.mask, 0) AS mask
             FROM p LEFT JOIN m USING (pid)),
    mc AS (SELECT mask, CAST(count(*) AS BIGINT) AS n
           FROM allp GROUP BY 1),
    coal AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS smask),
    v AS (SELECT smask,
                 CAST(coalesce(sum(CASE WHEN (mc.mask & coal.smask)
                                             = mc.mask
                                        THEN mc.n END), 0) AS BIGINT)
                   AS v
          FROM coal LEFT JOIN mc ON (mc.mask & coal.smask) = mc.mask
          GROUP BY smask),
    ch AS (SELECT * FROM (VALUES {", ".join(
        f"('{c}', {b})" for c, b in _SH_BITS)})
           AS c(channel, bit)),
    contrib AS (
      SELECT ch.channel,
             CAST(CASE bit_count(s.smask) {" ".join(
                 f"WHEN {k} THEN {w}" for k, w in _SH_COEF.items())}
                  END AS HUGEINT)
               * (vi.v - s.v) * 1000000 AS num
      FROM ch JOIN v s ON (s.smask & ch.bit) = 0
              JOIN v vi ON vi.smask = (s.smask | ch.bit)),
    tot AS (SELECT CAST(max(CASE WHEN smask = 15 THEN v END)
                        AS BIGINT) AS v_all,
                   CAST(max(CASE WHEN smask = 0 THEN v END)
                        AS BIGINT) AS v_organic
            FROM v)
    SELECT channel, CAST(sum(num) // 24 AS BIGINT) AS shapley_ppm,
           v_all AS n_purchases, v_organic AS n_organic
    FROM contrib CROSS JOIN tot
    GROUP BY channel, v_all, v_organic
    """,
    tags=("events", "attribution"),
)
def events_attribution_shapley(spark, sf_dir):
    """Shapley-value attribution — the game-theoretic member closing
    the attribution family (last-touch / linear / time-decay /
    Markov-removal): each channel's credit is its average marginal
    contribution across all coalition orderings, with
    v(S) = purchases whose distinct 7-day touch set is a subset of S
    (v(empty) = organic, so credits sum to attributed purchases
    exactly). With 4 channels the game is 16 coalition values — the
    per-purchase masks collapse to <= 16 (mask, count) rows, so the
    combinatorial part NEVER touches the fact table: one interval
    join builds distinct touch sets (bounded by per-user activity),
    one aggregate builds masks, and the 16x16 subset-sum + 4x8
    marginal table are broadcast-trivial at any scale.

    Exact arithmetic: weights are |S|!(n-|S|-1)! integers (x24 = 4!),
    contributions are ppm-scaled integer products accumulated in
    DECIMAL(38,0)/HUGEINT (1e9 purchases x 6 x 1e6 passes int64),
    one terminal truncating div 24 — engine-exact, no floats."""
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
         .select("pid", F.col("event_type").alias("touch"))
         .distinct())
    bit = F.when(F.col("touch") == _SH_BITS[0][0], _SH_BITS[0][1])
    for c, b in _SH_BITS[1:]:
        bit = bit.when(F.col("touch") == c, b)
    m = t.groupBy("pid").agg(F.sum(bit).cast("int").alias("mask"))
    allp = (p.join(m, "pid", "left")
            .select("pid", F.coalesce("mask", F.lit(0)).alias("mask")))
    mc = allp.groupBy("mask").agg(F.count("*").alias("n"))
    coal = spark.range(16).select(F.col("id").cast("int")
                                  .alias("smask"))
    v = (coal.join(F.broadcast(mc),
                   mc.mask.bitwiseAND(F.col("smask")) == mc.mask,
                   "left")
         .groupBy("smask")
         .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long")
              .alias("v")))
    ch = spark.createDataFrame(list(_SH_BITS), "channel string, bit int")
    coef = F.when(F.bit_count("smask") == 0, _SH_COEF[0])
    for k, w in list(_SH_COEF.items())[1:]:
        coef = coef.when(F.bit_count("smask") == k, w)
    s = v.select(F.col("smask"), F.col("v").alias("v_s"))
    vi = v.select(F.col("smask").alias("imask"),
                  F.col("v").alias("v_si"))
    contrib = (F.broadcast(ch).join(
        F.broadcast(s), s.smask.bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(vi),
              F.col("imask") == F.col("smask").bitwiseOR(F.col("bit")))
        .select("channel",
                (coef.cast("decimal(38,0)")
                 * (F.col("v_si") - F.col("v_s")) * 1_000_000)
                .alias("num")))
    tot = (v.agg(F.max(F.when(F.col("smask") == 15, F.col("v")))
                 .alias("v_all"),
                 F.max(F.when(F.col("smask") == 0, F.col("v")))
                 .alias("v_organic")))
    return (contrib.groupBy("channel")
            .agg(F.sum("num").alias("num"))
            .crossJoin(F.broadcast(tot))
            .select("channel",
                    F.expr("CAST(num div 24 AS BIGINT)")
                    .alias("shapley_ppm"),
                    F.col("v_all").alias("n_purchases"),
                    F.col("v_organic").alias("n_organic")))
